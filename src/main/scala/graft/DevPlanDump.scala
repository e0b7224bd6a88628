package graft

import graft.config.DedupConfig
import graft.pipeline.DedupPipeline
import graft.sources.{ClipCorpus, CorpusConfig}
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.execution.QueryExecution

/** Dev-only: find which query in a pipeline run renders a pathologically
  * large plan (lineage-explosion hunting). Not part of the library. */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkUtil.session(8, "plan-dump")
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    spark.listenerManager.register(new QueryExecutionListener {
      def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val n = qe.optimizedPlan.collect { case p => p }.size
        val phys = try qe.executedPlan.collect { case p => p }.size catch { case _: Throwable => -1 }
        if (n > 200 || phys > 200)
          sb.append(f"[plan] $funcName%-20s logical=$n%8d physical=$phys%8d  top=${qe.optimizedPlan.nodeName}\n")
      }
      def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      import org.apache.spark.sql.execution.SparkPlanInfo
      import org.apache.spark.sql.execution.ui.{SparkListenerSQLAdaptiveExecutionUpdate, SparkListenerSQLExecutionStart}
      private def walk(p: SparkPlanInfo, acc: scala.collection.mutable.Map[String, (Int, Long)]): Unit = {
        val (c, l) = acc.getOrElse(p.nodeName, (0, 0L))
        acc(p.nodeName) = (c + 1, l + p.simpleString.length)
        p.children.foreach(walk(_, acc))
      }
      private def report(tag: String, p: SparkPlanInfo): Unit = {
        val acc = scala.collection.mutable.Map[String, (Int, Long)]()
        walk(p, acc)
        val total = acc.values.map(_._2).sum
        if (total > 2000000L) {
          println(s"[big] $tag totalChars=$total")
          acc.toSeq.sortBy(-_._2._2).take(8).foreach { case (n, (c, l)) =>
            println(f"[big]   $n%-40s count=$c%7d chars=$l%10d") }
        }
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: SparkListenerSQLExecutionStart => report(s"start:${s.description.take(60)}", s.sparkPlanInfo)
        case s: SparkListenerSQLAdaptiveExecutionUpdate => report("aqe-update", s.sparkPlanInfo)
        case _ =>
      }
    })
    val clips = ClipCorpus.clips(spark, CorpusConfig(seed = 42L, n = 120L)).toDF()
    val root = java.nio.file.Files.createTempDirectory("plan-dump").toString
    def stat(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.optimizedPlan
      val nodes = p.collect { case x => x }.size
      val exprs = p.collect { case x => x }
        .map(_.expressions.map(e => e.collect { case y => y }.size).sum).sum
      println(f"[stat] $name%-16s nodes=$nodes%6d exprNodes=$exprs%9d")
    }
    val res = DedupPipeline.run(spark, clips, DedupConfig.default.copy(stageRoot = Some(root)))
    stat("signatures", res.signatures)
    stat("dupPairs", res.dupPairs)
    stat("clusters", res.clusters)
    res.clusters.count()
    Thread.sleep(2000)
    println(sb.toString)
    spark.stop()
  }
}
