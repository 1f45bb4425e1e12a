package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ExtractHrefs, SimHash64}

/** SQL-surface registration of the engine's native expressions, installable
  * via `spark.sql.extensions=graft.plans.GraftExtensions`:
  *
  *   SELECT simhash64(text) FROM documents
  *   SELECT explode(extract_hrefs(html)) FROM pages
  *
  * The Scala Column API works without this (graft.functions._); the
  * extension only adds the SQL names.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("extract_hrefs"),
      new ExpressionInfo(classOf[ExtractHrefs].getName, "extract_hrefs"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ExtractHrefs(children.head)))
  }
}
