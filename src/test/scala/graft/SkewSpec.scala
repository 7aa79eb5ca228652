package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.engine.Replayer
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.{LakeTable, MergeUpsert}
import graft.oracle.FoldOracle

/** Hot-key torture (SURVEY.md §4.3.3): the survey's skew claim is that
  * map-side combine in the merge aggregate IS the salting strategy — a hot
  * key collapses to one row per map task before the shuffle, so no reducer
  * ever receives the hot key's full event stream. This suite proves it:
  * correctness under a 50%-hot-key stream, and a plan-metric assertion
  * that the partial aggregate actually collapses the skew. */
class SkewSpec extends SparkSpec {

  private val hotCfg = GenConfig(seed = 99L, numEvents = 40000L,
    numRepos = 40, pathsPerRepo = 50, epochSize = 10000L,
    hotKeyPct = 50) // half of ALL events hit one (repo, path)

  test("replay with one key at ~50% of events matches the fold oracle") {
    val table = new LakeTable(tmpDir("skew"), 8)
    val events = ChangeGen.stream(spark, hotCfg).toDF()
    Replayer.run(spark, events, table, maxEpoch = 3, compactEvery = 4)
    assert(FoldOracle.digestOfTable(table.snapshot(spark)) ==
      FoldOracle.digestOfState(FoldOracle.expectedState(hotCfg)))
    // sanity: the stream really is skewed
    val hot = events.filter(col("repo") === "repo-hot").count()
    assert(hot > hotCfg.numEvents * 2 / 5, s"hot key only $hot events")
  }

  test("partial aggregate collapses the hot key map-side (shuffle never sees the skew)") {
    val events = ChangeGen.stream(spark, hotCfg).toDF()
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val agg = MergeUpsert.latestPerKey(events)
      agg.collect()
      val plan = agg.queryExecution.executedPlan
      val aggs = plan.collect { case o: ObjectHashAggregateExec => o }
      assert(aggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$plan")
      val partialOut = aggs.last.metrics("numOutputRows").value // bottom-most = partial
      val totalIn = hotCfg.numEvents
      // 40k events over ≤2k keys × ≤8 map tasks: the partial agg must emit
      // orders of magnitude fewer rows than events — the hot key's 20k
      // events leave each map task as ONE row
      assert(partialOut <= totalIn / 4,
        s"map-side combine ineffective: $partialOut rows shuffled of $totalIn events")
      val finalOut = aggs.head.metrics("numOutputRows").value
      val distinctKeys = events.select("repo", "path").distinct().count()
      assert(finalOut == distinctKeys)
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
  }
}
