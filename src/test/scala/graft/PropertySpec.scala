package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.streaming.DocumentStore
import graft.streaming.AnsModel._

/** Property tests (SURVEY.md §5 rule 3) over the pure core of the tag
  * transform — the invariants that make the at-least-once streaming sink
  * safe. Uses raw scalacheck generators with fixed seeds (the scalatest
  * bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private val genTag: Gen[Tag] = for {
    s <- Gen.alphaLowerStr
    t <- Gen.alphaLowerStr
  } yield Tag("s" + s.take(8), t.take(8))

  private val genDoc: Gen[AnsDoc] = for {
    id <- Gen.identifier.map(_.take(10))
    rev <- Gen.option(Gen.posNum[Long])
    tags <- Gen.option(Gen.option(Gen.listOfN(3, genTag)))
  } yield AnsDoc(id, rev, tags.map(t => Taxonomy(t)))

  /** Deterministic exhaustive-ish sampling: 300 seeded draws per property. */
  private def forAllSeeded[A](g: Gen[A])(check: A => Unit): Unit = {
    val p = Gen.Parameters.default.withSize(20)
    (1L to 300L).foreach { i =>
      g.apply(p, Seed(i)).foreach(check)
    }
  }

  test("modifyAns is idempotent: f(f(d)) == f(d)") {
    forAllSeeded(Gen.zip(genDoc, genTag)) { case (d, t) =>
      val once = DocumentStore.modifyAns(d, t)
      assert(DocumentStore.modifyAns(once, t) == once)
    }
  }

  test("modifyAns always results in exactly one copy of the tag") {
    forAllSeeded(Gen.zip(genDoc, genTag)) { case (d, t) =>
      val out = DocumentStore.modifyAns(d, t)
      assert(out.taxonomy.get.tags.get.count(_ == t) == 1)
    }
  }

  test("modifyAns preserves pre-existing tags and their order") {
    forAllSeeded(Gen.zip(genDoc, genTag)) { case (d, t) =>
      val before = d.taxonomy.flatMap(_.tags).getOrElse(Seq.empty)
      val after = DocumentStore.modifyAns(d, t).taxonomy.get.tags.get
      assert(after.startsWith(before) || before.contains(t))
    }
  }

  test("modifyAns commutes for distinct tags up to order (set semantics)") {
    forAllSeeded(Gen.zip(genDoc, genTag, genTag)) { case (d, t1, t2) =>
      val ab = DocumentStore.modifyAns(DocumentStore.modifyAns(d, t1), t2)
      val ba = DocumentStore.modifyAns(DocumentStore.modifyAns(d, t2), t1)
      assert(ab.taxonomy.get.tags.get.toSet == ba.taxonomy.get.tags.get.toSet)
    }
  }
}
