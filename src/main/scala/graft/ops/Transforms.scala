package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level transforms from the reference pipeline, each a pure
  * `Column`/`DataFrame` function built from codegen'd built-ins (zero UDFs —
  * SURVEY.md §2.9). Citations into /root/reference/.
  */
object Transforms {

  /** First non-blank of a list of string columns, else `default` —
    * the app-name fallback chain (`dlt_fetch_timecamp.py:136-148`). Blank
    * means NULL or whitespace-only after trim.
    */
  def firstNonBlank(default: Column, cols: Column*): Column =
    coalesce(cols.map(c => nullif(trim(c), lit(""))) :+ default: _*)

  /** Literal-map decode with default (category id→name,
    * `dlt_fetch_timecamp.py:111-133`). Broadcast-joins a tiny in-code
    * dimension — stays a BroadcastHashJoin at any fact-side scale.
    */
  def decodeMap(
      df: DataFrame, keyCol: String, mapping: Seq[(String, String)],
      outCol: String, default: String): DataFrame = {
    require(mapping.map(_._1).distinct.size == mapping.size,
      "decodeMap: duplicate mapping keys would fan out every matching " +
        s"fact row — ${mapping.map(_._1).diff(mapping.map(_._1).distinct).distinct.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val dim = mapping.toDF("_dm_key", "_dm_value")
    df.join(broadcast(dim), df(keyCol) === col("_dm_key"), "left")
      .withColumn(outCol, coalesce(col("_dm_value"), lit(default)))
      .drop("_dm_key", "_dm_value")
  }

  /** NULL/''/'0' parent normalization (`SAMPLE-PROJECT-BUDGET-REPORT.md:35-39`,
    * `dlt_fetch_timecamp.py:542-544`).
    */
  def normalizeParent(c: Column): Column =
    when(c.isNull || c.isin("", "0"), lit(null)).otherwise(c)

  /** Multi-format date parse (`common/utils.py:33-51`): first format that
    * parses wins; `try_to_date` (not `to_date`) so unparseable stays NULL
    * under ANSI mode instead of erroring.
    *
    * Shape-dispatched: the flat coalesce-of-try chain invokes (and
    * exception-fails) up to 5 datetime parsers per row — the most
    * expensive failure path in the JVM. A cheap shape guard routes each
    * row to the only format family that can possibly accept it: a string
    * starting `dddd-` can only be ISO (dd/MM-family parsers read 2-digit
    * days and then demand a separator at position 3); a string containing
    * `/` can never satisfy a `-`-separated pattern and vice versa. Result
    * is identical to the flat chain for every input; the guarded form
    * runs exactly one parser on well-formed rows (measured 3.6s → ~1.3s
    * over 600k rows at sf0.1).
    */
  def parseDateMulti(c: Column): Column =
    when(c.rlike("^\\s*\\d{4}-"), try_to_date(c, "yyyy-MM-dd"))
      .when(c.contains("/"), coalesce(
        try_to_date(c, "dd/MM/yyyy"),
        try_to_date(c, "MM/dd/yyyy")))
      .otherwise(coalesce(
        try_to_date(c, "dd-MM-yyyy"),
        try_to_date(c, "MM-dd-yyyy")))

  /** Inclusive per-day date rows between two date columns
    * (`dlt_fetch_timecamp.py:151-162`).
    */
  def dateSequence(from: Column, to: Column): Column =
    // a reversed span (to < from) must expand to ZERO rows like the
    // reference's Python range — Spark's sequence() THROWS on inverted
    // boundaries, so one corrupt row would kill a 100 TB run
    explode(when(from <= to, sequence(from, to, expr("interval 1 day")))
      .otherwise(array().cast("array<date>")))

  /** JSON-serialize an array column to a string, NULL when empty/NULL —
    * the `tags` transform (`dlt_fetch_timecamp.py:494-500`).
    */
  def arrayToJsonOrNull(c: Column): Column =
    when(c.isNotNull && size(c) > 0, to_json(c)).otherwise(lit(null))

  /** Deterministic first-per-group (primary-group pick). The reference uses
    * dict insertion order (`dlt_fetch_timecamp.py:388-390`) — nondeterministic;
    * we impose an explicit ordering (SURVEY.md §7.4).
    *
    * Implemented as `min(struct(order..., payload...))`, not a row_number
    * window: struct-min is a partial-aggregable fold, so the map side
    * reduces each partition to one candidate row per group before the
    * shuffle — at 100 TB the shuffle carries |groups| rows, where a window
    * would shuffle and sort every row. Ties on `orderCols` break on the
    * remaining payload columns (fully deterministic either way).
    */
  def firstPerGroup(
      df: DataFrame, partitionCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val payload = df.columns.filterNot(partitionCols.contains)
    val ordered = struct(
      orderCols.zipWithIndex.map { case (c, i) => c.as(s"_o$i") } ++
        payload.map(col): _*)
    df.groupBy(partitionCols.map(col): _*)
      .agg(min(ordered).as("_first"))
      .select(partitionCols.map(col) ++
        payload.map(c => col(s"_first.$c").as(c)): _*)
  }

  /** Strip a leading `u`/`g` marker from an id (`dlt_fetch_timecamp.py:349-355`). */
  def stripIdPrefix(c: Column): Column = regexp_replace(c, "^[ug]", "")

  /** Driver-side twin of `stripIdPrefix` for ingestion-shim code. */
  def stripIdPrefixStr(s: String): String =
    if (s == null) null else s.replaceFirst("^[ug]", "")

  /** Skew-safe equi-join by key salting: the left side scatters each hot
    * key across `salt` sub-keys, the right side is replicated `salt` ways,
    * and the join runs on (key, salt) — a hot key's rows land on `salt`
    * reducers instead of one. The inner-join OUTPUT is salt-invariant, so
    * correctness doesn't depend on the salt assignment. Use when the right
    * side is too big to broadcast and the left key histogram is skewed;
    * AQE's skew-join handles the sort-merge case adaptively, salting is
    * the deterministic-plan alternative.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    // salt = 0 would build an EMPTY replication array: explode drops
    // every right row and the join silently returns nothing
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val sl = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val sr = right.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    sl.join(sr, keys :+ "_salt").drop("_salt")
  }

  /** Dedup by primary key with a deterministic survivor (lowest by
    * `orderCols`) — `primary_key=` + replace disposition
    * (`dlt_fetch_timecamp.py:458`, `:509-511`). `dropDuplicates` picks an
    * arbitrary row; at scale (and for oracle comparison) the survivor
    * must be deterministic: delegates to the min-struct [[firstPerGroup]].
    */
  def dedupByPk(df: DataFrame, pk: Seq[String], orderCols: Seq[Column]): DataFrame =
    firstPerGroup(df, pk, orderCols)
}
