package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY r17 phase profiler for st19_cdc_stream — not committed. */
object ProfSt19 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode", "simple")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("GRAFT_WSCG", "true"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("GRAFT_CGCACHE", "100"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val epoch = System.nanoTime()
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[
      (Int, Double, Double, String)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty(
              "spark.job.description"))).getOrElse("")
          val call = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          jobStart.put(j.jobId, (System.nanoTime(), s"$desc | $call"))
        }
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStart.remove(j.jobId)).foreach { case (t0, d) =>
            jobLog.add((j.jobId, (t0 - epoch) / 1e9,
              (System.nanoTime() - t0) / 1e9, d))
          }
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          tasks.incrementAndGet()
      })
    def codegenMs: Long = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME.getSnapshot.getValues.sum / 1000000
    Tables(s, d).events.count()
    Tables(s, d).documents.count()
    SparkEntry.warmFixtures(s, d)

    // one-off: how expensive is rendering a kernel-literal plan?
    {
      graft.expressions.GraftFunctions.register(s)
      val cents = graft.pipelines.Similarity.seedCentroids(8, 64)
      val cb = graft.pipelines.Similarity.pqSeedCodebooks(8, 16, 8)
      val emb = Tables(s, d).embeddings
      val df = emb.withColumn("cell",
        graft.pipelines.Similarity.ivfCellAtNative(col("embedding"), cents))
      val qe = df.queryExecution
      qe.executedPlan // force
      var t0 = System.nanoTime()
      (1 to 10).foreach(_ => qe.explainString(
        org.apache.spark.sql.execution.SimpleMode))
      println(f"[render] explainString(simple) x10 cell-plan: " +
        f"${(System.nanoTime() - t0) / 1e9}%6.3f s")
      t0 = System.nanoTime()
      (1 to 10).foreach(_ => qe.executedPlan.treeString)
      println(f"[render] treeString x10 cell-plan: " +
        f"${(System.nanoTime() - t0) / 1e9}%6.3f s")
      val df2 = emb.limit(10).select(col("vec_id"))
      val qe2 = df2.queryExecution; qe2.executedPlan
      t0 = System.nanoTime()
      (1 to 10).foreach(_ => qe2.explainString(
        org.apache.spark.sql.execution.SimpleMode))
      println(f"[render] explainString(simple) x10 plain-plan: " +
        f"${(System.nanoTime() - t0) / 1e9}%6.3f s")
    }

    var last = System.nanoTime()
    def lap(name: String): Unit = {
      val now = System.nanoTime()
      println(f"[lap] $name%-28s ${(now - last) / 1e9}%7.2f s " +
        f"at=${(now - epoch) / 1e9}%8.2f")
      last = now
    }

    (1 to 1).foreach { rep =>
      println(s"=== rep $rep ===")
      last = System.nanoTime()
      val root = {
        val m = SparkEntry.getClass.getDeclaredMethod(
          "tblIdxFixture", classOf[SparkSession], classOf[String])
        m.setAccessible(true)
        m.invoke(SparkEntry, s, d).asInstanceOf[String]
      }
      lap("fixture clone")
      val landing = java.nio.file.Files
        .createTempDirectory("graft_cdcs_ticks").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_cdcs_ckpt").toString
      val emb = Tables(s, d).embeddings
      val mk = (sp: SparkSession) =>
        graft.sources.AtomicTable(sp, s"$root/table",
          partCol = "label", defaultKeys = Seq("vec_id"),
          partType = _.toInt)
      val src = mk(s)
      import s.implicits._
      def tick(n: Long): Unit = {
        Seq(n).toDF("tick").coalesce(1)
          .write.mode("append").parquet(landing)
        lap(s"tick$n landing write")
        val q = graft.streaming.IndexStream.startCdcSync(s, landing,
          mk, s"$root/idx", ckpt)
        if (!q.awaitTermination(180000))
          sys.error("streaming query did not finish within 180s")
        lap(s"tick$n stream+sync")
      }
      src.upsert(emb.filter(col("vec_id") % 29 === 2)
        .withColumn("embedding", reverse(col("embedding"))))
      lap("gen1 upsert")
      tick(1L)
      src.upsert(emb.filter(col("vec_id") % 58 === 2))
      lap("gen2 upsert")
      val labels = emb.select("label").distinct()
        .collect().map(_.get(0).toString).toSeq
      require(src.deleteWhere(labels, col("vec_id") === 13) == 1L)
      lap("gen2 delete")
      src.insertIgnore(emb.filter(col("vec_id") % 59 === 1)
        .withColumn("vec_id", col("vec_id") + 2000000L))
      lap("gen2 insert")
      tick(2L)
      val qv = emb.filter(col("vec_id") === 0).select("embedding")
        .collect()(0).getSeq[Float](0).map(_.toDouble).toArray
      def serve() =
        graft.sources.Warehouse.ivfPqServe(s, s"$root/idx", qv, topK = 10,
            nprobe = 2, cand = 50)
          .orderBy(col("cosine").desc, col("vec_id"))
      val settled = serve().collect().toSeq
      lap("serve settled")
      tick(3L)
      require(serve().collect().toSeq == settled,
        "a tick over an unchanged table must not move the index")
      lap("serve recheck")
      Caches.releaseAll()
      val rt = Runtime.getRuntime
      println(s"[mem] persistentRDDs=" +
        s"${spark.sparkContext.getPersistentRDDs.size} " +
        s"heapUsedMB=${(rt.totalMemory - rt.freeMemory) / 1048576} " +
        s"activeCaches=${Caches.activeCount} " +
        s"jobs=${jobs.get} tasks=${tasks.get}")
      val h = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME
      val gh = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_GENERATED_CLASS_BYTECODE_SIZE
      println(s"[cg] compiles=${h.getCount} " +
        f"meanMs=${h.getSnapshot.getMean}%.1f " +
        f"approxTotalSec=${h.getCount * h.getSnapshot.getMean / 1000}%.1f " +
        s"classes=${gh.getCount}")
      import scala.jdk.CollectionConverters._
      val logged = jobLog.asScala.toSeq
      println(f"[jobs] n=${logged.size} sumSec=${logged.map(_._3).sum}%.1f")
      logged.sortBy(_._2).foreach { case (id, at, t, d) =>
        println(f"[job] #$id%4d at=$at%8.2f dur=$t%6.3f  ${d.take(120)}")
      }
    }
    spark.stop()
  }
}
