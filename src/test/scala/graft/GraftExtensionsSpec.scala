package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The config-only deployment path: a session built with
  * `spark.sql.extensions=graft.GraftExtensions` must carry every
  * native function and the dot-fold optimizer rule WITHOUT any
  * driver-side `register()` call — that is the contract that lets a
  * cluster operator enable the library for SQL-only users.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withInjectedSession[A](body: SparkSession => A): A = {
    val base = TestSpark.spark // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf: getOrCreate resolves it
    // from the SparkContext's conf (builder options on an existing
    // context never reach it), exactly as a real `--conf` submit would.
    // The accessor is private[spark]; reflection reaches the live conf
    // so this spec drives the genuine config-resolution path
    val liveConf = base.sparkContext.getClass.getMethod("conf")
      .invoke(base.sparkContext)
      .asInstanceOf[org.apache.spark.SparkConf]
    liveConf.set("spark.sql.extensions", "graft.GraftExtensions")
    try {
      // getOrCreate reuses the running SparkContext but, with no
      // default session, builds a FRESH SparkSession and applies the
      // configured extensions — the config-only deployment path
      val injected = SparkSession.builder()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      assert(injected ne base, "expected a fresh session")
      body(injected)
    } finally {
      liveConf.remove("spark.sql.extensions")
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("spark.sql.extensions injects functions + optimizer rule") {
    withInjectedSession { s =>
      // pure-SQL use, no register() anywhere on this session
      val row = s.sql(
        """SELECT graft_dot(array(1.0F, 2.0F, 3.0F),
          |                 array(4.0F, 5.0F, 6.0F)) AS d,
          |       graft_registered_domain('a.b.example.co.uk') AS dom,
          |       element_at(graft_text_stats('one two three'), 1) AS words
          |""".stripMargin).collect()(0)
      assert(row.getDouble(0) === 32.0)
      assert(row.getString(1) === "example.co.uk")
      assert(row.getLong(2) === 3L)

      // the injected rule lives in the optimizer's extended batch and
      // rewrites the declarative fold — no extraOptimizations involved
      assert(s.experimental.extraOptimizations.isEmpty)
      def vec(salt: Int) = array((0 until 8).map(j =>
        (pmod(hash(col("id") * 100 + lit(salt * 17 + j)), lit(1000))
          .cast("float") / 500f - 1f)): _*)
      val plan = s.range(10).select(vec(1).as("a"), vec(2).as("b"))
        .select(graft.pipelines.Similarity.dot(col("a"), col("b")).as("d"))
        .queryExecution.optimizedPlan.toString
      assert(plan.contains("graft_dot"), plan)
      assert(!plan.contains("aggregate("), plan)

      // programmatic register() on an injected session stays a no-op:
      // no duplicate rule into extraOptimizations
      graft.expressions.GraftFunctions.register(s)
      assert(s.experimental.extraOptimizations.isEmpty,
        "register() must not re-add the rule on an injected session")
    }
  }

  test("installViews: a SQL-only client queries every reference table " +
    "with zero driver-side Scala in the query path") {
    withInjectedSession { s =>
      val dir = "/root/testdata/sf0.001"
      val names = Tables.installViews(s, dir)
      assert(names.size === 13)
      // every registered view resolves and reads via pure SQL
      names.foreach { n =>
        assert(s.sql(s"SELECT * FROM $n LIMIT 1").collect().nonEmpty, n)
      }
      // a real cross-view query — the positions-style join shape
      val top = s.sql(
        """SELECT p.symbol, count(*) AS n
          |FROM prices p JOIN journal j
          |  ON p.symbol = j.symbol AND p.id = j.id
          |GROUP BY p.symbol ORDER BY n DESC, p.symbol LIMIT 3
          |""".stripMargin).collect()
      assert(top.nonEmpty && top.head.getLong(1) > 0L)
      // native functions compose with the views — the Thrift/Connect
      // client shape (extension conf + views, no Scala anywhere)
      assert(s.sql(
        """SELECT sum(element_at(graft_text_stats(text), 1)) AS words
          |FROM documents""".stripMargin).head().getLong(0) > 0L)
      // SQL answers match the DataFrame path over the same parquet
      val viaSql = s.sql(
        """SELECT symbol, count(*) AS count FROM prices
          |GROUP BY symbol ORDER BY symbol""".stripMargin)
        .collect().toSeq
      val viaDf = Tables(s, dir).pricesFromEvents
        .groupBy("symbol").count().orderBy("symbol").collect().toSeq
      assert(viaSql === viaDf)
      // the views are lazy plans over the scans: a symbol filter still
      // reaches the parquet reader as a pushed predicate
      val pushed = s.sql(
        "SELECT price FROM prices WHERE symbol = 'click'")
        .queryExecution.executedPlan.toString
      assert(pushed.contains("PushedFilters") &&
        pushed.contains("EqualTo(event_type,click)"), pushed)
    }
  }
}
