package graft.sources

import graft.core.TextSpec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured/DB source modality (S8/S9, J8, F6–F8): relational schema +
  * rows → KG concepts/edges/rules + serialized row text.
  *
  * The reference reads Postgres via asyncpg (src/qortex/sources/postgres.py,
  * postgres_graph.py:83-281) and maps schema metadata through
  * sources/mapping_rules.py. Spark-side, the *read* is `spark.read.jdbc`
  * (no database ships in this sandbox, so tests feed the same-shaped
  * DataFrames); everything downstream of the read — serialization,
  * FK classification, constraint→rule, schema→KG — is implemented and
  * tested here.
  *
  * Expected metadata shapes (the postgres_graph.py discover_schema output):
  *   tables(table_name STRING, columns ARRAY<STRING>, pk_columns ARRAY<STRING>)
  *   fks(table_name STRING, source_column STRING, ref_table STRING,
  *       on_delete STRING)
  *   constraints(table_name STRING, constraint_name STRING, check_clause STRING)
  */
object Structured {

  // --- F7: humanize names (sources/serializer.py:41-55) ---

  def humanizeTableName(t: String): String = {
    val singular =
      if (t.endsWith("s") && !t.endsWith("ss")) t.dropRight(1) else t
    singular.replace('_', ' ')
  }

  def humanizeColumnName(c: String): String = c.replace('_', ' ')

  // --- F6: row → text serialization (serializer.py:15-167) ---

  private val skipNames = Set("id", "uuid", "created_at", "updated_at",
    "deleted_at", "created_by", "updated_by")
  private val skipSuffixes = Seq("_id", "_uuid", "_at", "_hash")
  private val priorityNames = Set("name", "title", "label", "display_name", "slug")
  private val descriptionNames = Set("description", "notes", "body", "content",
    "summary", "text")

  def isInternalColumn(name: String): Boolean = {
    val l = name.toLowerCase(java.util.Locale.ROOT)
    skipNames.contains(l) || skipSuffixes.exists(l.endsWith)
  }

  /** Value formatting (serializer.py:57-72): bool → yes/no, float → %g
    * (trailing zeros dropped), everything else cast to string. Null → null
    * so concat_ws drops the whole fragment.
    */
  private def fmt(df: DataFrame, name: String): Column = {
    val c = col(name)
    df.schema(name).dataType match {
      case BooleanType => when(c, "yes").otherwise("no")
      case FloatType | DoubleType =>
        // %g-style: strip a trailing ".0"
        regexp_replace(c.cast("string"), "\\.0$", "")
      case _ => c.cast("string")
    }
  }

  /** NaturalLanguageSerializer (serializer.py:78-141) as a pure column
    * expression built from the static schema — whole-stage-codegen'd, no
    * UDF, nulls dropped per fragment by concat_ws.
    * "A {entity} named '{name}' {description} with {col}: {v}, ..."
    */
  def serializeNatural(df: DataFrame, tableName: String): Column = {
    val entity = humanizeTableName(tableName)
    val cols = df.columns.filterNot(isInternalColumn)
    def nonEmpty(name: String): Column = {
      val f = fmt(df, name)
      when(col(name).isNotNull && f =!= "", f)
    }
    val lowerOf = (n: String) => n.toLowerCase(java.util.Locale.ROOT)
    val priority = cols.filter(c => priorityNames.contains(lowerOf(c)))
      .map(c => when(nonEmpty(c).isNotNull, concat(lit("named '"), nonEmpty(c), lit("'"))))
    val desc = cols.filter(c => descriptionNames.contains(lowerOf(c))).map(nonEmpty)
    val other = cols.filterNot(c =>
      priorityNames.contains(lowerOf(c)) || descriptionNames.contains(lowerOf(c)))
      .map(c => when(nonEmpty(c).isNotNull,
        concat(lit(humanizeColumnName(c) + ": "), nonEmpty(c))))
    val head = concat_ws(" ", lit(s"A $entity") +: priority: _*)
    val mid = if (desc.isEmpty) lit(null).cast("string") else concat_ws(". ", desc: _*)
    val tail =
      if (other.isEmpty) lit(null).cast("string")
      else {
        val joined = concat_ws(", ", other: _*)
        when(joined =!= "", concat(lit("with "), joined))
      }
    concat_ws(" ", head, when(mid =!= "", mid), when(tail.isNotNull, tail))
  }

  /** KeyValueSerializer (serializer.py:144-167): "table=t, col=v, ...". */
  def serializeKeyValue(df: DataFrame, tableName: String): Column = {
    val parts = df.columns.filterNot(isInternalColumn).map { c =>
      when(col(c).isNotNull, concat(lit(c + "="), fmt(df, c)))
    }
    concat_ws(", ", lit(s"table=$tableName") +: parts: _*)
  }

  /** Rows → pages-shaped text for the ingestion pipeline (S8 read path:
    * plug `spark.read.jdbc(...)` output straight in).
    */
  def rowsAsDocuments(df: DataFrame, tableName: String): DataFrame =
    df.select(
      concat(lit(s"db://$tableName/"),
        sha2(serializeKeyValue(df, tableName), 256).substr(1, 16)).as("url"),
      serializeNatural(df, tableName).as("text"))

  // --- S8: live JDBC read (the reference's asyncpg fetch,
  //     src/qortex/sources/postgres.py, as spark.read.jdbc) ---

  /** Read one table over JDBC. When `partitionOn` gives a numeric column
    * and bounds, the read is split into `numPartitions` range-parallel
    * queries — the scale path: executors pull disjoint slices, nothing
    * funnels through the driver. Without it the read is a single partition
    * (fine for dimension-sized tables only).
    */
  def readTable(
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties(),
      partitionOn: Option[(String, Long, Long, Int)] = None
  )(implicit spark: SparkSession): DataFrame =
    partitionOn match {
      case Some((column, lower, upper, n)) =>
        spark.read.jdbc(url, table, column, lower, upper, n, properties)
      case None => spark.read.jdbc(url, table, properties)
    }

  /** Rows of a JDBC table → pages-shaped documents (url, text), ready for
    * the ingestion pipeline — the end-to-end DB modality.
    */
  def readTableAsDocuments(
      url: String,
      table: String,
      properties: java.util.Properties = new java.util.Properties(),
      partitionOn: Option[(String, Long, Long, Int)] = None
  )(implicit spark: SparkSession): DataFrame =
    rowsAsDocuments(readTable(url, table, properties, partitionOn), table)

  /** Discover schema metadata over JDBC — the analog of
    * postgres_graph.discover_schema (postgres_graph.py:83-281), which
    * queries pg_catalog driver-side. Uses java.sql.DatabaseMetaData for
    * tables/columns/PKs/FKs (portable across engines); CHECK constraints
    * have no JDBC metadata API, so `checkConstraintSql` optionally supplies
    * a dialect query returning (table_name, constraint_name, check_clause).
    * Metadata is driver-side by nature (bounded by schema size, same as the
    * reference); only the DATA read (`readTable`) is distributed.
    *
    * Returns (tables, fks, constraints) in the schemaToKg input shapes.
    */
  def discoverSchema(
      url: String,
      schemaPattern: String = null,
      checkConstraintSql: Option[String] = None,
      /** Connection properties (user/password/...) — same object shape
        * `readTable` takes, so S8/S9 authenticate identically against a
        * credentialed Postgres.
        */
      properties: java.util.Properties = new java.util.Properties()
  )(implicit spark: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val conn = java.sql.DriverManager.getConnection(url, properties)
    try {
      val md = conn.getMetaData
      val tableNames = {
        val rs = md.getTables(null, schemaPattern, "%", Array("TABLE"))
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString("TABLE_NAME")
        rs.close(); b.result()
      }
      val tables = tableNames.map { t =>
        val cols = {
          val rs = md.getColumns(null, schemaPattern, t, "%")
          val b = Seq.newBuilder[(Int, String)]
          while (rs.next()) b += ((rs.getInt("ORDINAL_POSITION"), rs.getString("COLUMN_NAME")))
          rs.close(); b.result().sortBy(_._1).map(_._2)
        }
        val pks = {
          val rs = md.getPrimaryKeys(null, schemaPattern, t)
          val b = Seq.newBuilder[(Short, String)]
          while (rs.next()) b += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
          rs.close(); b.result().sortBy(_._1).map(_._2)
        }
        (lowerName(t), cols.map(lowerName), pks.map(lowerName))
      }
      val fks = tableNames.flatMap { t =>
        val rs = md.getImportedKeys(null, schemaPattern, t)
        val b = Seq.newBuilder[(String, String, String, String)]
        while (rs.next()) b += ((
          lowerName(rs.getString("FKTABLE_NAME")),
          lowerName(rs.getString("FKCOLUMN_NAME")),
          lowerName(rs.getString("PKTABLE_NAME")),
          deleteRuleName(rs.getShort("DELETE_RULE"))))
        rs.close(); b.result()
      }
      val constraints = checkConstraintSql.toSeq.flatMap { sql =>
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(sql)
          val b = Seq.newBuilder[(String, String, String)]
          while (rs.next())
            b += ((lowerName(rs.getString(1)), lowerName(rs.getString(2)), rs.getString(3)))
          rs.close(); b.result()
        } finally st.close()
      }
      (tables.toDF("table_name", "columns", "pk_columns"),
        fks.toDF("table_name", "source_column", "ref_table", "on_delete"),
        constraints.toDF("table_name", "constraint_name", "check_clause"))
    } finally conn.close()
  }

  /** SQL identifiers arrive uppercased from case-folding engines (Derby,
    * Oracle); fold to the lowercase convention the mapping rules key on.
    */
  private def lowerName(s: String): String =
    if (s == null) null else s.toLowerCase(java.util.Locale.ROOT)

  private def deleteRuleName(code: Short): String = code match {
    case java.sql.DatabaseMetaData.importedKeyCascade => "CASCADE"
    case java.sql.DatabaseMetaData.importedKeyRestrict => "RESTRICT"
    case java.sql.DatabaseMetaData.importedKeySetNull => "SET NULL"
    case java.sql.DatabaseMetaData.importedKeySetDefault => "SET DEFAULT"
    case _ => "NO ACTION"
  }

  // --- J8: FK → relation type (mapping_rules.py:27-81) ---

  private val ownership = Set("user_id", "owner_id", "author_id", "creator_id",
    "created_by")
  private val templateRe = ".*_template_id$|.*_type_id$|.*_category_id$|.*_class_id$|template_id$"
  private val junctionSuffixes = Seq("_links", "_associations", "_tags", "_roles")

  /** Priority order (mapping_rules.py:38-81): ownership → junction (name
    * suffix or ≥2 FKs with ≤2 non-key cols) → CASCADE → template pattern →
    * PART_OF. Expressed as one case/when column over the joined
    * fk×table-metadata frame.
    */
  def classifyFk(sourceColumn: Column, onDelete: Column, tableName: Column,
      nFks: Column, nNonKeyCols: Column): Column = {
    val colL = lower(sourceColumn)
    val tblL = lower(tableName)
    val junctionName = junctionSuffixes
      .map(s => tblL.endsWith(s))
      .reduce(_ || _)
    when(colL.isin(ownership.toSeq: _*), "BELONGS_TO")
      .when(junctionName || (nFks >= 2 && nNonKeyCols <= 2), "USES")
      .when(upper(onDelete) === "CASCADE", "PART_OF")
      .when(colL.rlike(templateRe), "INSTANCE_OF")
      .otherwise("PART_OF")
  }

  // --- F8: CHECK constraint → rule text (mapping_rules.py:89-120) ---

  /** Strip balanced outer parens, prefix "In {table}, ". Pure. */
  def constraintRuleText(table: String, checkClause: String): String = {
    var clean = if (checkClause == null) "" else checkClause.trim
    var continue = true
    while (continue && clean.startsWith("(") && clean.endsWith(")")) {
      val inner = clean.substring(1, clean.length - 1)
      var depth = 0
      var balanced = true
      for (ch <- inner if balanced) {
        if (ch == '(') depth += 1
        else if (ch == ')') { depth -= 1; if (depth < 0) balanced = false }
      }
      if (balanced && depth == 0) clean = inner.trim else continue = false
    }
    s"In $table, $clean"
  }

  private val constraintRuleUdf = udf(constraintRuleText _)

  // --- S9: schema metadata → KG (postgres_graph.py:283-354 semantics) ---

  /** Map discovered schema metadata to concepts/edges/rules:
    *  - one concept per table (name = title-cased humanized table name,
    *    description lists the columns)
    *  - one typed edge per FK (J8 classification), confidence 0.9
    *  - one rule per CHECK constraint (F8), category "constraint"
    */
  def schemaToKg(tables: DataFrame, fks: DataFrame, constraints: DataFrame,
      domain: String)(implicit spark: SparkSession): (DataFrame, DataFrame, DataFrame) = {
    val nameUdf = udf((t: String) => TextSpec.titleCase(humanizeTableName(t)))
    val concepts = tables.select(
      concat(lit(s"$domain:"), nameUdf(col("table_name"))).as("id"),
      nameUdf(col("table_name")).as("name"),
      concat(lit("Database table "), col("table_name"), lit(" with columns "),
        concat_ws(", ", col("columns"))).as("description"),
      lit(domain).as("domain"),
      col("table_name").as("source_id"))

    // per-table FK count + non-key column count for the junction heuristic
    val fkCounts = fks.groupBy(col("table_name"))
      .agg(count(lit(1)).as("__nfk"),
        collect_set(col("source_column")).as("__fkcols"))
    val meta = tables.join(fkCounts, Seq("table_name"), "left")
      .select(col("table_name"),
        coalesce(col("__nfk"), lit(0L)).as("__nfk"),
        size(filter(col("columns"), c =>
          !array_contains(coalesce(col("__fkcols"), array()), c) &&
            !array_contains(col("pk_columns"), c) &&
            !c.isin("created_at", "modified_at", "id"))).as("__nonkey"))

    val edges = fks.join(meta, Seq("table_name"))
      .select(
        concat(lit(s"$domain:"), nameUdf(col("table_name"))).as("source_id"),
        concat(lit(s"$domain:"), nameUdf(col("ref_table"))).as("target_id"),
        classifyFk(col("source_column"), col("on_delete"), col("table_name"),
          col("__nfk"), col("__nonkey")).as("relation_type"),
        lit(0.9).as("confidence"),
        concat(lit("FK "), col("table_name"), lit("."), col("source_column"),
          lit(" -> "), col("ref_table")).as("source_text"))

    val rules = constraints.select(
      concat(lit("dbrule:"), sha2(concat_ws("|", col("table_name"),
        col("constraint_name")), 256).substr(1, 16)).as("id"),
      constraintRuleUdf(col("table_name"), col("check_clause")).as("text"),
      lit(domain).as("domain"),
      col("table_name").as("source_id"),
      array(concat(lit(s"$domain:"), nameUdf(col("table_name")))).as("concept_ids"),
      lit("constraint").as("category"),
      lit(0.9).as("confidence"))

    (concepts, edges, rules)
  }
}
