package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the scrub pass every production corpus runs before
  * training (emails, IP addresses, phone-shaped digit runs → typed
  * placeholder tokens; the reference pipeline has no text at all, so this is
  * purely the LLM-curation surface).
  *
  * The patterns are deliberately restricted to the syntax subset that Java's
  * regex engine (Spark `regexp_replace`) and RE2 (DuckDB) interpret
  * IDENTICALLY — character classes, bounded counted repetition, `\d`, and
  * ASCII `\b` word boundaries; no backreferences, no lookaround (RE2 has
  * neither). Greedy leftmost matching resolves the same way in both engines
  * for these patterns, so a redacted string is bit-equal cross-engine — the
  * q128-family oracle checks the OUTPUT TEXT, not just counts.
  *
  * Rules apply as a sequential fold in declaration order (each pattern runs
  * on the previous rule's output), and the SQL twin states the same fold —
  * order matters (an email's host part must not survive to look like a
  * hostname-ish token for later rules), so it is part of the contract.
  *
  * Scale shape: pure per-row string rewriting — narrow projection, no
  * shuffle, codegen'd `regexp_replace` with compiled-once patterns. At
  * 100 TB this runs at scan speed alongside the rest of the quality pass.
  */
object Redact {

  /** One redaction rule; `pattern` must stay inside the Java∩RE2 subset and
    * must not contain single quotes (it is spliced into SQL literals).
    */
  final case class Rule(name: String, pattern: String, replacement: String) {
    require(!pattern.contains("'"), "pattern would break the SQL literal twin")
  }

  val Email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
  val Ipv4: Rule = Rule("ipv4",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
  val Phone: Rule = Rule("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>")

  /** Email first (its host part contains dots that could half-match the IP
    * rule), then IP, then the bare phone shape.
    */
  val Default: Seq[Rule] = Seq(Email, Ipv4, Phone)

  /** Sequential-fold redaction of `c`. */
  def redact(c: Column, rules: Seq[Rule] = Default): Column =
    rules.foldLeft(c)((acc, r) => regexp_replace(acc, r.pattern, r.replacement))

  /** DuckDB twin of [[redact]] — same fold, same order; RE2 needs the 'g'
    * flag to replace every occurrence like Spark does.
    */
  def redactSql(e: String, rules: Seq[Rule] = Default): String =
    rules.foldLeft(e)((acc, r) =>
      s"regexp_replace($acc, '${r.pattern}', '${r.replacement}', 'g')")

  /** Matches of ONE rule against the original (pre-fold) string — the audit
    * count a scrub report wants per category.
    */
  def matchCount(c: Column, r: Rule): Column =
    size(regexp_extract_all(c, lit(r.pattern), lit(0))).cast("long")

  /** DuckDB twin of [[matchCount]]. */
  def matchCountSql(e: String, r: Rule): String =
    s"CAST(len(regexp_extract_all($e, '${r.pattern}')) AS BIGINT)"
}
