package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII masking / format-audit primitives for GDPR-style exports — the
  * transform a curation pipeline applies before handing a table to a
  * downstream consumer: mask identifying digits but keep enough tail
  * for joining/debugging, and audit that structured identifiers match
  * their declared format (a malformed phone in an export is usually an
  * upstream parsing bug, not a real number).
  *
  * Engine-portable by construction: only `length`/`substring`/
  * `regexp_replace`/`rlike` with RE2-safe patterns (no lookarounds,
  * no backreferences), so a DuckDB/Trino replica of the same
  * expressions is bit-identical — oracle-checkable (q208).
  */
object PiiMask {

  /** Digits masked to `*` except the last `keep` characters of the
    * value (the common "ends in 1234" display form). NULL-safe; values
    * shorter than `keep` pass through unmasked.
    */
  def maskDigitsKeepLast(c: Column, keep: Int = 4): Column = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    when(c.isNull, lit(null))
      .when(length(c) <= keep, c)
      .otherwise(concat(
        regexp_replace(c.substr(lit(1), length(c) - keep),
          lit("[0-9]"), lit("*")),
        c.substr(length(c) - (keep - 1), lit(keep))))
  }

  /** TPC-H-style phone format: `CC-DDD-DDD-DDDD` (country code 2
    * digits). Anchored full-match; NULL stays NULL.
    */
  def phoneFormatValid(c: Column): Column =
    c.rlike("^[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}$")

  /** Count of email-shaped substrings in free text (RE2-safe pattern).
    * NULL input yields NULL — the SQL-conventional propagation, chosen
    * deliberately so the natural DuckDB/Trino replica
    * (`len(regexp_split_to_array(c, pat)) - 1`, which is NULL on NULL)
    * stays bit-identical without a coalesce on either side; callers
    * wanting zero-on-NULL coalesce at the use site.
    */
  def emailCount(c: Column): Column =
    size(split(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")) - 1
}
