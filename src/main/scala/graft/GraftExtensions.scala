package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the canonical way to ship this
  * engine as a library: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) injects the whole SQL
  * function surface into every session built on the cluster, no
  * driver-side registerAll call required.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.SqlBuilders.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name), builder))
    }
    // the corpus's ->/->> JSON operators, mapped onto json_get /
    // json_as_text before delegation (see ArrowSql for the grammar rules)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
