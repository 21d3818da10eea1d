package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expression for public-suffix registered-domain extraction.
  *
  * The earlier declarative formulation compiled the full bundled PSL
  * (~9.6k suffixes) into literal `InSet`s inside the expression tree —
  * correct and scan-side, but the literals serialized into EVERY task
  * binary of every stage whose plan touched a domain column (~1 MB per
  * task binary; Spark logs "Broadcasting large task binary"). At a
  * 100k-task stage that is real scheduler and network pressure for
  * data that never changes mid-query.
  *
  * This expression carries only its child: the suffix tables live in
  * the [[graft.pipelines.PublicSuffixes]] singleton, loaded once per
  * executor JVM from the jar's bundled resource — the classpath ships
  * the data, the task closure ships one tree node. Semantics are
  * unchanged (same rule tables the DuckDB oracle mirror interpolates;
  * see [[graft.pipelines.Web.registeredDomainSql]]).
  */
object Domains {

  /** `graft_registered_domain(host)` — registrable domain of an
    * already-lowercased host per the PSL longest-match algorithm
    * ([[graft.pipelines.PublicSuffixes.registeredDomainOf]]).
    */
  case class RegisteredDomain(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(
        graft.pipelines.PublicSuffixes.registeredDomainOf(
          input.asInstanceOf[UTF8String].toString))
    override protected def withNewChildInternal(c: Expression)
        : RegisteredDomain = copy(child = c)
    override def prettyName: String = "graft_registered_domain"
  }
}
