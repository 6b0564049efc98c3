package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level deduplication — the first pass of the public web-pipeline
  * recipes (CCNet / RefinedWeb / FineWeb all dedup by normalized URL
  * before any content pass: it is the only dedup that costs one string
  * kernel per row). Canonicalization folds the high-frequency aliasing
  * sources — scheme/host case, `www.` prefixes, default ports, trailing
  * slashes, fragment anchors, tracking parameters, query-parameter
  * order — so syntactically different fetches of the same resource
  * collapse to one key.
  *
  * Pure column algebra (one codegen projection, no UDF): the exact
  * convention is value-checked against a DuckDB mirror, so it is pinned
  * engine-neutrally. Convention (documented, oracle-enforced):
  * URLs carry a scheme (`x://`), at most one `?`, and `#` starts the
  * fragment. Dedup is one partial-aggregating groupBy on the canonical
  * key — at 100 TB the shuffle carries (url, id) pairs once, and
  * map-side combine reduces planted-duplicate-heavy corpora before the
  * exchange.
  */
object Url {

  /** Canonical form:
    *   - drop everything from the first `#` (fragment)
    *   - scheme and host lowercase; strip a leading `www.`; strip a
    *     default `:80`/`:443` port
    *   - strip trailing `/` runs from the path
    *   - drop empty and `utm_`-prefixed query params, sort the rest
    *     byte-order, re-join with `&`; drop the `?` when none survive
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = substring_index(u, "#", 1)
    val scheme = lower(substring_index(noFrag, "://", 1))
    val rest = substring_index(noFrag, "://", -1)
    val host0 = substring_index(rest, "/", 1)
    val host = regexp_replace(
      regexp_replace(lower(host0), "^www\\.", ""), ":(80|443)$", "")
    val pathq = rest.substr(length(host0) + 1, lit(1 << 20))
    val path = regexp_replace(substring_index(pathq, "?", 1), "/+$", "")
    val query = when(instr(pathq, "?") > 0,
      pathq.substr(instr(pathq, "?") + 1, lit(1 << 20))).otherwise(lit(""))
    val params = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= lit("") && !p.startsWith("utm_"))), "&")
    concat(scheme, lit("://"), host, path,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }

  /** Collapse `df` to one row per canonical URL: (url, n, keep_id) with
    * `keep_id` = the minimum id (first-crawled-wins under monotonic
    * ids) and `n` the collapsed count. Join survivors back on `keep_id`
    * to materialize the deduped corpus.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(canonicalizeUrl(col(urlCol)).as("url"), col(idCol))
      .groupBy(col("url"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keep_id"))

  /** The canonical host of a URL (lowercase, `www.`/default-port
    * stripped) — the blocklist key of the URL-filtering stage.
    */
  def hostOf(u: Column): Column = {
    val rest = substring_index(substring_index(u, "#", 1), "://", -1)
    regexp_replace(regexp_replace(
      lower(substring_index(rest, "/", 1)), "^www\\.", ""), ":(80|443)$", "")
  }

  /** Domain balancing — cap each canonical host's contribution at `k`
    * documents (the web-pipeline counter to boilerplate-heavy megasites
    * drowning the mixture; the public pipelines cap per-domain document
    * share before quality work). Which k survive is the engine-stable
    * md5 draw of [[graft.ops.Search.clusterBalancedSample]], keyed here
    * on the host: ONE keyed window, state bounded per host, no global
    * sort; seeded, so a re-crawl keeps the same survivors.
    */
  def capPerHost(df: DataFrame, idCol: String, urlCol: String, k: Int,
                 seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("__host", hostOf(col(urlCol)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__host")).orderBy(
          md5(concat(col(idCol).cast("string"), lit(seed.toString))),
          col(idCol))))
      .filter(col("__rn") <= k).drop("__rn", "__host")
  }

  /** Drop rows whose canonical host is on `blocked` or under a blocked
    * domain (suffix match on dot boundaries: blocking `example.com`
    * blocks `a.example.com` but not `notexample.com`) — the public
    * web-pipeline blocklist pass (RefinedWeb/FineWeb filter on curated
    * domain lists before any content work). The blocklist is model
    * state: it inlines as one codegen OR-chain per row, no join, no
    * shuffle — at 100 TB this is a free rider on the first corpus scan.
    */
  def filterBlockedHosts(df: DataFrame, urlCol: String,
                         blocked: Seq[String]): DataFrame = {
    val h = hostOf(col(urlCol))
    val hit = blocked.map(b => h === b || h.endsWith("." + b))
      .foldLeft(lit(false))(_ || _)
    df.filter(!hit)
  }
}
