#!/usr/bin/env python3
"""Scale-factor ladder for the most expensive bench entries (dev tool).

Runs graft.Bench at sf0.001 / sf0.01 / sf0.1 restricted (SPARK_GRAFT_ONLY)
to the top-cost entries, each run against a FRESH artifact cache so the
artifact_* lines measure a real build, and fits a per-entry scaling
exponent: alpha in t ~ sf^alpha, from the sf0.01 -> sf0.1 decade (the
sf0.001 point sits on the fixed per-query overhead floor, so it is
reported but not fitted). alpha <= ~1.1 is linear-ish; >> 1 flags a
scale-killer empirically rather than by plan reading.

Writes BENCH_ladder.json. Usage: tools/bench_ladder.py [cpus]
"""
import json, math, os, subprocess, sys, tempfile, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = ["0.001", "0.01", "0.1"]
# third decade (round-11 verdict task 6): a ladder-only synthetic
# sf~1 slice (10 disjoint key-remapped replicas of sf0.1 — see
# graft.tools.MakeLadderSf1). Generated outside the driver-owned
# testdata; included when present.
SF1_DIR = os.environ.get("GRAFT_SF1_DIR", "/tmp/graft-sf1")
ENTRIES = [
    "artifact_pairs", "artifact_labels", "artifact_epairs",
    "artifact_edges",
    "q102_mutual_knn", "q108_lsh_recall", "q110_bpe_encode",
    "q116_simhash_pairs", "q117_heavy_hitters", "q119_triangles",
    "q134_communities", "q140_clustering_coeff", "q142_image_dhash",
    # round-10 streaming-engine drains: state-store cost must scale
    # linearly with the replayed volume too
    "q207_stream_windows", "q211_stream_sessions",
    # round-10 top-cost algorithmic addition
    "q218_ktruss_peel",
    # round-11: row-sketch KMV vs the native kmv_lows aggregate — the
    # native one's exchange is bounded at k longs/group/partition, so
    # its alpha should sit at or below the row sketch's
    "q105_kmv_sketch", "q234_kmv_native_agg",
    # round-11 second-session graph-iteration additions: the ANF's
    # per-round exchange is bounded at k longs/node; the walk frontier
    # is |starts|-sized and must stay flat
    "q241_neighborhood_fn", "q246_random_walks",
    # round-11 third-session additions: PQ trains m sub-codebooks +
    # encodes the corpus (iters+1 scans, k x dims exchanges); Boruvka's
    # per-round exchange is one min-edge per component (halving)
    "q260_pq_ann", "q262_boruvka_mst",
    # round-11 fourth session: the sort-free selection's cost should be
    # ~flat per scan (histogram aggregates are KB-sized at every SF);
    # the pair-statistic's cost tracks |days|^2, which the calendar
    # bounds — both claims belong on the ladder
    "q266_selection_quantiles", "q267_kendall_tau",
    # round-12: the shared wedge enumeration is its own billable
    # artifact; the sampled census must scale ~p^2 below the exact
    # face; the keyed drill's cost is ~flat per scan like q266's
    "artifact_tris", "q281_triangles_sampled", "q282_quantiles_per_key",
    # round-12 late additions: index-store load path must stay ~flat;
    # the MAD screen is two drills (~2x q282); the sketched overlap is
    # one kmv_lows scan + groups^2 driver arithmetic
    "q283_pq_index_reuse", "q284_mad_per_key", "q286_sketched_overlap",
    # round-12 fifth session: the bootstrap is ONE scan whose 40×
    # replicate expansion collapses map-side (alpha ~ scan); harmonic
    # centrality adds a third sketch-propagation round over q241;
    # DBSCAN's candidate-pair mass tracks grid density (the corpus is
    # fixed-size per SF replica, so expect ~flat); the epoch emission
    # is scan + explode with a sources-sized broadcast
    "q292_bootstrap_ci", "q296_harmonic_centrality", "q297_dbscan_grid",
    "q298_epoch_resample",
    # the 5-round LPA labeling became its own shared artifact (q134 +
    # q306 both read it); bill the rounds once and verify the
    # modularity tail is label-join-sized
    "artifact_lpa", "q306_modularity",
    # the sparsified approximate LPA face: one O(m) ranking pass +
    # rounds on <= 8n edges (measured 1.7x under the exact rounds at
    # sf~1; the win grows with hub degree)
    "q312_lpa_sampled",
    # wedge-sampled clustering: one O(m log) ranking pass + k·n probes
    # (24.8 s at sf~1 vs the exact enumeration's 46-62 s, and strictly
    # O(m log m) where the exact face tracks wedge density)
    "q313_sampled_clustering",
    # round-13: the scale-adaptive LSH banding face — band keys widen
    # with n, so candidate-pair mass (and time) must stay ~linear where
    # fixed-key q102 grows ~n²/2^r
    "q314_knn_adaptive",
    # round-13: sampled-source bounded-hop Brandes — |seeds| grows with
    # the part table, each tree is depth-bounded, so expect ~linear
    # (measured 3.1 s warm at sf~1)
    "q322_betweenness",
    # round-13: the CUSUM alarm is one keyed window pass — expect ~scan
    "q321_cusum_alarm",
    # round-14: HTML extraction is a per-row parse (scan-shaped); the
    # planted-recall audit is the adaptive-banding pass plus a planted
    # pair join, so it must track q314
    "q323_html_extract", "q324_planted_recall",
]

# round-13 verdict task 5: the half-decade extension — the largest
# sf~1 absolutes get an sf~3 point (30 key-remapped replicas of sf0.1,
# MakeLadderSf1 with reps=30) so the top-decade alpha fits are
# interpolations, not extrapolations. Only these entries run at sf~3;
# the full ENTRIES sweep there would cost an hour for queries whose
# fits are already scan-flat.
SF3_DIR = os.environ.get("GRAFT_SF3_DIR", "/tmp/graft-sf3")
# q102 (FIXED 4-bit keys) is deliberately absent: at sf~3 (60k
# vectors) one pass exceeded 10 minutes — the measured n²/2^r wall
# itself. Its scale path q314 (adaptive keys) carries the sf~3 point;
# q102's own fit stays on the sf0.1->sf~1 decade where it terminates.
SF3_ENTRIES = [
    "artifact_edges", "artifact_tris", "artifact_lpa",
    "q218_ktruss_peel", "q312_lpa_sampled",
    "q313_sampled_clustering", "q314_knn_adaptive",
]

# round-14 verdict task 3: a fourth decade endpoint. The sf~10 slice is
# MakeLadderSf1 applied to the sf~1 slice with reps=10 (isometries and
# vocab suffixes compose, so it equals ~100 key-remapped sf0.1 replicas)
# — the 100x design claim then rests on two fully MEASURED decades
# (sf0.1 -> sf~1 -> sf~10). Same entry set as sf~3.
SF10_DIR = os.environ.get("GRAFT_SF10_DIR", "/tmp/graft-sf10")

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


# per-scale record cache: each completed scale's Bench record is
# persisted immediately, so a crash (or OOM) at one scale never loses
# the hours already measured at the others. GRAFT_LADDER_REUSE=1 reuses
# cached records instead of re-running their scales — delete a record
# file (or the dir) to force a fresh measurement.
RUNS_DIR = os.environ.get("GRAFT_LADDER_RUNS", "/tmp/graft-ladder-runs")


def run_sf_once(sf: str, cpus: str):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = (
        SF1_DIR if sf == "1" else
        SF3_DIR if sf == "3" else
        SF10_DIR if sf == "10" else f"/root/testdata/sf{sf}")
    env["SPARK_GRAFT_CPUS"] = cpus
    env["SPARK_GRAFT_ONLY"] = ",".join(
        SF3_ENTRIES if sf in ("3", "10") else ENTRIES)
    # fresh cache root per (ladder, sf): artifact entries must measure a
    # real build, not a cross-session cache read
    env["GRAFT_ARTIFACT_CACHE"] = tempfile.mkdtemp(prefix=f"ladder-sf{sf}-")
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Xmx48g", "-Dderby.stream.error.file=/tmp/derby-ladder.log",
            "-cp", f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
            "graft.Bench"]
    t0 = time.time()
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         cwd=REPO, timeout=7200)
    wall = time.time() - t0
    lines = [l for l in out.stdout.splitlines()
             if l.startswith('{"metric"')]
    if not lines:  # JVM died without a record (e.g. OOM-killed)
        raise RuntimeError(
            f"sf{sf}: Bench exited rc={out.returncode} without a metric "
            f"line; stderr tail: {out.stderr[-800:]}")
    rec = json.loads(lines[0])
    print(f"sf{sf}: total={rec['value']:.1f}s wall={wall:.0f}s "
          f"cal={rec.get('cal')} load={rec.get('load')}", flush=True)
    return rec


def run_sf(sf: str, cpus: str):
    cache = os.path.join(RUNS_DIR, f"sf{sf}.json")
    if os.environ.get("GRAFT_LADDER_REUSE") == "1" and os.path.exists(cache):
        with open(cache) as f:
            rec = json.load(f)
        print(f"sf{sf}: reused {cache} (total={rec['value']:.1f}s)",
              flush=True)
        return rec
    try:
        rec = run_sf_once(sf, cpus)
    except RuntimeError as e:  # one retry on a recordless exit
        print(f"RETRY {e}", flush=True)
        rec = run_sf_once(sf, cpus)
    os.makedirs(RUNS_DIR, exist_ok=True)
    with open(cache, "w") as f:
        json.dump(rec, f)
    return rec


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    sfs = list(SFS)
    if os.path.isdir(SF1_DIR):
        sfs.append("1")
    if os.path.isdir(SF3_DIR):
        sfs.append("3")
    if os.path.isdir(SF10_DIR):
        sfs.append("10")
    runs = {sf: run_sf(sf, cpus) for sf in sfs}
    # cal-normalized times: t_norm = t * CAL_REF / min(cal probes) — the
    # same normalization graft.Bench publishes as "caln" (the run's
    # best probe pairs with min-of-N query times)
    CAL_REF = 0.175
    calns = {sf: (CAL_REF / min(runs[sf]["cal"])
                  if runs[sf].get("cal") else 1.0) for sf in sfs}
    table = {}
    for e in ENTRIES:
        ts = {sf: runs[sf]["queries"].get(e) for sf in sfs}
        tn = {sf: (round(ts[sf] * calns[sf], 3) if ts[sf] else None)
              for sf in sfs}
        alpha = None
        if ts["0.01"] and ts["0.1"] and ts["0.01"] > 0:
            alpha = round(math.log(ts["0.1"] / ts["0.01"]) / math.log(10), 2)
        table[e] = {"t": ts, "t_norm": tn, "alpha_01_to_1": alpha}
        if ts.get("1") and ts["0.1"]:
            table[e]["alpha_1_to_10"] = round(
                math.log(ts["1"] / ts["0.1"]) / math.log(10), 2)
        # half-decade interpolation point (verdict task 5): alpha over
        # sf~1 -> sf~3, on cal-NORMALIZED times (the 3x wall times of
        # these runs make raw cross-run ratios pure box noise)
        if tn.get("3") and tn.get("1"):
            table[e]["alpha_1_to_3_norm"] = round(
                math.log(tn["3"] / tn["1"]) / math.log(3), 2)
        # second measured decade endpoint (round-14): sf~3 -> sf~10 on
        # cal-normalized times
        if tn.get("10") and tn.get("3"):
            table[e]["alpha_3_to_10_norm"] = round(
                math.log(tn["10"] / tn["3"]) / math.log(10.0 / 3.0), 2)
    out = {
        "entries": table,
        "cal": {sf: runs[sf].get("cal") for sf in sfs},
        "caln": calns,
        "load": {sf: runs[sf].get("load") for sf in sfs},
        "note": ("alpha fitted on the sf0.01->sf0.1 decade; sf0.001 "
                 "times sit on the per-query scheduling overhead floor. "
                 "alpha<=1.1 linear-ish, >1.5 flags super-linear."),
    }
    with open(f"{REPO}/BENCH_ladder.json", "w") as f:
        json.dump(out, f, indent=1)
    for e, r in sorted(table.items(), key=lambda kv: -(kv[1]["t"]["0.1"] or 0)):
        ts = r["t"]
        print(f"{e:28s} {ts['0.001'] or 0:7.2f} {ts['0.01'] or 0:7.2f} "
              f"{ts['0.1'] or 0:7.2f} {ts.get('1') or 0:7.2f}  "
              f"alpha={r['alpha_01_to_1']} "
              f"alpha_top={r.get('alpha_1_to_10')} "
              f"alpha_sf3={r.get('alpha_1_to_3_norm')} "
              f"alpha_sf10={r.get('alpha_3_to_10_norm')}")


if __name__ == "__main__":
    main()
