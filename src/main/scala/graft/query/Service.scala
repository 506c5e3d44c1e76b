package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Service-level query surfaces: glob name filtering (F5) and the
  * knowledge-stats breakdown (A7).
  */
object Service {

  /** F5 — glob → regex name filter (core/backend.py:561-565: '*' → '.*',
    * '?' → '.', case-insensitive, full match like Cypher's =~). All other
    * characters are regex-escaped so a literal '(' in a concept name cannot
    * break the pattern.
    */
  def globToRegex(glob: String): String =
    "(?i)" + glob.map {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+^$|".contains(c) => "\\" + c
      case c => c.toString
    }.mkString

  /** Filter rows whose `nameCol` matches the glob. The predicate is a plain
    * rlike — codegen'd, pushed as far as Catalyst allows.
    */
  def filterByNameGlob(df: DataFrame, pattern: String, nameCol: String = "name"): DataFrame =
    df.filter(col(nameCol).rlike("^" + globToRegex(pattern) + "$"))

  private def domainOf(idCol: Column): Column = substring_index(idCol, ":", 1)

  /** A7 — service knowledge stats (service.py:1040-1056): per-domain
    * concept/edge/rule counts. Edge/rule domains derive from the
    * "{domain}:{Name}" id scheme. Three cheap aggregations + two joins —
    * every count is map-side combinable.
    */
  def knowledgeStats(concepts: DataFrame, edges: DataFrame, rules: DataFrame): DataFrame = {
    val c = concepts.groupBy(col("domain")).agg(count(lit(1)).as("concepts"))
    val e = edges.groupBy(domainOf(col("source_id")).as("domain"))
      .agg(count(lit(1)).as("edges"))
    val r = rules.groupBy(col("domain")).agg(count(lit(1)).as("rules"))
    c.join(e, Seq("domain"), "full_outer")
      .join(r, Seq("domain"), "full_outer")
      .select(col("domain"),
        coalesce(col("concepts"), lit(0L)).as("concepts"),
        coalesce(col("edges"), lit(0L)).as("edges"),
        coalesce(col("rules"), lit(0L)).as("rules"))
  }
}
