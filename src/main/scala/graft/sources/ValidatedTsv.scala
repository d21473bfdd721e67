package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — the reference's workhorse validated-TSV scan
  * (ccmm/gtex/parsers/util.py:31-105): read a tab-delimited file with a
  * declared column spec, assert the header, validate every cell
  * (regex / controlled vocabulary / integer-code map / empty-allowed),
  * map codes to labels, and enforce primary-key uniqueness.
  *
  * Spark-first re-expression: instead of the reference's row-at-a-time
  * fatal exit on first error, validation is a declarative pass that
  * returns BOTH the mapped data and a violations DataFrame; callers gate
  * on `violations.isEmpty` (same strictness, whole-file error reporting —
  * SURVEY.md §7.4.6). All checks are built-in expressions, so the scan +
  * validation stays in one codegen stage and the violations scan prunes
  * to only the checked columns.
  *
  * Divergence from the reference, by design (SURVEY.md §7.4.3): the `cv`
  * whitelist is declared but never enforced there (parsers/util.py:87-89);
  * here the declared semantic IS enforced.
  */
object ValidatedTsv {

  sealed trait Rule
  /** Cell must match the anchored regex. */
  final case class Regex(pattern: String) extends Rule
  /** Cell must be one of the allowed values (controlled vocabulary). */
  final case class Cv(values: Seq[String]) extends Rule
  /** Cell must start with an integer code present in the map; the mapped
    * label replaces the raw value (reference `integer_cv`,
    * parsers/util.py:74-86). */
  final case class IntegerCv(mapping: Map[Int, String]) extends Rule
  /** No constraint. */
  case object AnyValue extends Rule

  final case class ColumnSpec(name: String, rule: Rule = AnyValue, emptyOk: Boolean = false)

  /** data: one column per spec (integer_cv columns mapped to labels, raw
    * code kept as `<name>_raw`); violations: (pk, column, rule, value). */
  final case class Result(data: DataFrame, violations: DataFrame)

  final case class HeaderMismatchException(expected: Seq[String], actual: Seq[String])
    extends RuntimeException(s"header mismatch: expected $expected, got $actual")

  final case class ValidationFailedException(sample: Seq[String])
    extends RuntimeException(s"validation failed; sample violations: ${sample.mkString("; ")}")

  private def isEmptyCell(c: Column): Column = c.isNull || c === ""

  def read(spark: SparkSession, path: String, specs: Seq[ColumnSpec],
           primaryKey: String, sep: String = "\t"): Result = {
    val raw = spark.read
      .option("sep", sep).option("header", "true")
      // every column arrives as string — the reference keeps strings too
      // (SURVEY.md §1.2); typing happens in downstream projections
      .option("inferSchema", "false")
      .csv(path)

    // Header assertion (parsers/util.py:42-47): names AND order.
    if (raw.columns.toSeq != specs.map(_.name))
      throw HeaderMismatchException(specs.map(_.name), raw.columns.toSeq)

    val pk = col(primaryKey)

    def cellViolation(s: ColumnSpec): Column = {
      val c = col(s.name)
      val emptyViolation =
        if (s.emptyOk) lit(false) else isEmptyCell(c)
      val ruleViolation = s.rule match {
        case Regex(p) => !isEmptyCell(c) && !regexp_like(c, lit(p))
        case Cv(vs) => !isEmptyCell(c) && !c.isin(vs: _*)
        case IntegerCv(m) =>
          val code = regexp_extract(c, "^(\\d+)", 1)
          !isEmptyCell(c) && (code === "" || !code.cast("int").isin(m.keys.toSeq: _*))
        case AnyValue => lit(false)
      }
      emptyViolation || ruleViolation
    }

    def ruleName(s: ColumnSpec): String = s.rule match {
      case _: Regex => "regex"
      case _: Cv => "cv"
      case _: IntegerCv => "integer_cv"
      case AnyValue => "required"
    }

    // SINGLE-PASS cell validation: one struct per spec, array_compact to
    // drop the passing cells, one explode — the file is scanned ONCE for
    // all rules, not once per spec (the previous per-spec filter+union
    // form read an 11-column file 11 times; at 100 TB that is 11 reads).
    val checkStructs = specs.map { s =>
      when(cellViolation(s), struct(
        lit(s.name).as("column"), lit(ruleName(s)).as("rule"),
        col(s.name).as("value")))
    }
    val cellViolations = raw
      .select(pk.as("pk"), array_compact(array(checkStructs: _*)).as("vs"))
      .select(col("pk"), explode(col("vs")).as("v"))
      .select(col("pk"), col("v.column").as("column"),
        col("v.rule").as("rule"), col("v.value").as("value"))

    // Duplicate-PK check (parsers/util.py:97-103; dup ⇒ fatal there).
    val dupViolations = raw.groupBy(pk).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(pk.as("pk"), lit(primaryKey).as("column"),
        lit("duplicate_key").as("rule"), col("n").cast("string").as("value"))

    // Mapped projection: integer_cv code→label, default = raw value
    // (parsers/util.py:74-92 `mapped_value`).
    val dataCols: Seq[Column] = specs.flatMap { s =>
      s.rule match {
        case IntegerCv(m) =>
          val mapping = map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
          val code = regexp_extract(col(s.name), "^(\\d+)", 1).cast("int")
          Seq(
            coalesce(element_at(mapping, code), col(s.name)).as(s.name),
            col(s.name).as(s.name + "_raw"))
        case _ => Seq(col(s.name))
      }
    }

    Result(raw.select(dataCols: _*), cellViolations.unionByName(dupViolations))
  }

  /** Strict gate: materialize violations; throw (with a sample of them)
    * if any exist — the reference's sys.exit(1) semantic, but reporting
    * the whole file's problems at once. */
  def readStrict(spark: SparkSession, path: String, specs: Seq[ColumnSpec],
                 primaryKey: String, sep: String = "\t"): DataFrame = {
    val r = read(spark, path, specs, primaryKey, sep)
    val bad = r.violations.limit(20).collect()
    if (bad.nonEmpty)
      throw ValidationFailedException(bad.map(_.toString).toSeq)
    r.data
  }
}
