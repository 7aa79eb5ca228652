package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.engine.Replayer
import graft.gen.{ChangeGen, GenConfig}
import graft.lake.LakeTable
import graft.model.ChangeEvent
import graft.oracle.FoldOracle

/** Property-based invariants (SURVEY.md §5): the fold semantics are
  * idempotent / duplication-invariant / prefix-composable over ARBITRARY
  * event streams (scalacheck), and the Spark engine replays randomized
  * generator configs to the oracle state. */
class MergePropertySpec extends SparkSpec {

  /** scalatestplus-scalacheck is not in the offline cache; drive
    * scalacheck directly. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private val genEvent: Gen[Long => ChangeEvent] = for {
    op <- Gen.frequency(4 -> "I", 4 -> "U", 2 -> "D")
    repo <- Gen.oneOf("r1", "r2", "r3")
    path <- Gen.oneOf("a", "b", "c", "d", "e")
    commit <- Gen.hexStr.map(_.take(8).padTo(8, '0'))
    lang <- Gen.oneOf("scala", "java")
    content <- Gen.alphaNumStr.map(_.take(16))
  } yield (seq: Long) =>
    ChangeEvent(seq, seq / 5, op, repo, path, commit, lang, content, 1)

  private val genEvents: Gen[List[ChangeEvent]] =
    Gen.listOfN(40, genEvent).map(_.zipWithIndex.map {
      case (f, i) => f(i.toLong)
    })

  test("fold is idempotent under whole-stream re-delivery") {
    check(Prop.forAll(genEvents) { evs =>
      FoldOracle.expectedState(evs ++ evs) == FoldOracle.expectedState(evs)
    })
  }

  test("fold is invariant under random duplicate injection") {
    val withDups = for {
      evs <- genEvents
      dups <- Gen.someOf(evs)
    } yield (evs, evs ++ dups)
    check(Prop.forAll(withDups) { case (evs, dup) =>
      FoldOracle.expectedState(dup) == FoldOracle.expectedState(evs)
    })
  }

  test("fold is invariant under delivery-order shuffling (seq is the order)") {
    val shuffled = for {
      evs <- genEvents
      perm <- Gen.const(()).map(_ => scala.util.Random.shuffle(evs))
    } yield (evs, perm)
    check(Prop.forAll(shuffled) { case (evs, perm) =>
      FoldOracle.expectedState(perm) == FoldOracle.expectedState(evs)
    })
  }

  test("fold composes: fold(all) == fold(fold(prefix) replayed ++ suffix)") {
    check(Prop.forAll(genEvents, Gen.choose(0, 40)) { (evs, cut0) =>
      val cut = math.min(cut0, evs.size)
      val (pre, post) = evs.splitAt(cut)
      // replaying the prefix state as synthetic U-events with their
      // original seqs, then the suffix, converges to the same state
      val preState = FoldOracle.expectedState(pre)
      val replayedPre = preState.values.toList.zipWithIndex.map {
        case (s, _) =>
          val origSeq = pre.filter(e => e.repo == s.repo && e.path == s.path)
            .map(_.seq).max
          ChangeEvent(origSeq, origSeq / 5, "U", s.repo, s.path, s.commit,
            s.lang, s.content, 1)
      }
      FoldOracle.expectedState(replayedPre ++ post) ==
        FoldOracle.expectedState(evs)
    })
  }

  test("engine replay equals oracle for randomized generator configs") {
    val configs = Seq(
      GenConfig(seed = 101L, numEvents = 600, numRepos = 5, pathsPerRepo = 9,
        epochSize = 100, pctInsert = 50, pctUpdate = 20, pctDelete = 30,
        duplicateRate = 80),
      GenConfig(seed = 202L, numEvents = 900, numRepos = 40, pathsPerRepo = 3,
        epochSize = 450, pctInsert = 10, pctUpdate = 80, pctDelete = 10),
      GenConfig(seed = 303L, numEvents = 500, numRepos = 1, pathsPerRepo = 1,
        epochSize = 50, pctInsert = 30, pctUpdate = 40, pctDelete = 30,
        duplicateRate = 200) // 1 maximally hot key + heavy re-delivery
    )
    configs.foreach { c =>
      val table = new LakeTable(tmpDir("lake"), 4)
      val maxEpoch = (c.numEvents - 1) / c.epochSize
      Replayer.run(spark, ChangeGen.stream(spark, c).toDF(), table, maxEpoch)
      assert(FoldOracle.digestOfTable(table.snapshot(spark)) ==
        FoldOracle.digestOfState(FoldOracle.expectedState(
          c.copy(duplicateRate = 0))), s"config seed=${c.seed}")
    }
  }
}
