package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ingest.Normalizer

/** Property tests for the dedup/idempotency invariants (SURVEY.md §5):
  * whatever events arrive — duplicates, replays, arbitrary orderings — the
  * deduplicated result must be a subset of the input, contain exactly one
  * row per key, be idempotent under re-application, and be stable under
  * input permutation.
  */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic ScalaCheck sampling: run `body` over `n` seeded draws. */
  private def forSamples[A](gen: Gen[A], n: Int = 15)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val eventGen: Gen[(String, Int, Int)] = for {
    key <- Gen.oneOf((1 to 8).map(i => s"k$i"))   // few keys → many collisions
    ts <- Gen.choose(0, 50)
    payload <- Gen.choose(0, 1000)
  } yield (key, ts, payload)

  private val batchGen: Gen[List[(String, Int, Int)]] =
    Gen.listOfN(40, eventGen)

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 25)
    edges <- Gen.listOfN(n, for {
      a <- Gen.choose(1L, 15L); b <- Gen.choose(1L, 15L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges

  test("connected components agree with a union-find reference on random graphs") {
    forSamples(graphGen, n = 10) { edges =>
      val nodes = (1L to 15L).toList
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val truth = nodes.map(v => v -> find(v)).toMap
      val got = graft.analysis.Dedup.connectedComponents(
          edges.toDF("src", "dst"), nodes.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === truth, s"edges=$edges")
    }
  }

  test("triangle counts agree with a brute-force reference on random graphs") {
    forSamples(graphGen, n = 10) { edges =>
      val und = edges.filter { case (a, b) => a != b }.toSet
      val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toList.sorted
      def adj(a: Long, b: Long) = und.contains((math.min(a, b), math.max(a, b)))
      val truth = nodes.map { v =>
        v -> nodes.combinations(2).count {
          case Seq(x, y) => x != v && y != v && adj(v, x) && adj(v, y) && adj(x, y)
          case _ => false
        }.toLong
      }.toMap
      if (und.nonEmpty) {
        val got = graft.analysis.Graphs.triangleCounts(und.toList.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === truth, s"edges=$und")
      }
    }
  }

  test("dedupFirst: one row per key, subset of input, idempotent, order-insensitive") {
    forSamples(batchGen) { rows =>
      {
        val df = rows.toDF("dedup_key", "ts", "payload")
        val order = Seq(col("ts"), col("payload"))
        val out = Normalizer.dedupFirst(df, Seq("dedup_key"), order)
        val collected = out.collect()

        // exactly one row per distinct key
        assert(collected.length === rows.map(_._1).distinct.length)
        // every output row existed in the input
        val inputSet = rows.toSet
        assert(collected.forall(r =>
          inputSet.contains((r.getString(0), r.getInt(1), r.getInt(2)))))
        // the kept row is the minimum under the ordering
        val expected = rows.groupBy(_._1).map { case (k, g) =>
          k -> g.map(e => (e._2, e._3)).min
        }
        assert(collected.forall(r =>
          expected(r.getString(0)) === ((r.getInt(1), r.getInt(2)))))
        // idempotent
        assert(Normalizer.dedupFirst(out, Seq("dedup_key"), order).count()
          === collected.length.toLong)
        // permutation-stable
        val shuffled = new scala.util.Random(rows.hashCode.toLong)
          .shuffle(rows).toDF("dedup_key", "ts", "payload")
        val outShuffled = Normalizer.dedupFirst(shuffled, Seq("dedup_key"), order)
          .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted
        assert(outShuffled.toSeq ===
          collected.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sorted.toSeq)
      }
    }
  }

  test("exact dedup: fingerprint-equal texts always collapse to the min id") {
    val textGen = Gen.oneOf(
      "the quick brown fox", "The  quick   brown FOX!", "something else entirely",
      "a third document body", "THE QUICK BROWN FOX")
    forSamples(Gen.listOfN(12, textGen)) { texts =>
      {
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val out = graft.analysis.Dedup.dedupExact(docs).collect()
        // one survivor per distinct normalized form
        val norms = texts.map(_.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
          .replaceAll("\\s+", " ").trim).distinct
        assert(out.length === norms.length)
        // survivor is the smallest doc_id of its group
        val expectedIds = texts.zipWithIndex
          .groupBy { case (t, _) => t.toLowerCase.replaceAll("[^a-z0-9\\s]", " ")
            .replaceAll("\\s+", " ").trim }
          .values.map(_.map(_._2).min.toLong).toSet
        assert(out.map(_.getLong(0)).toSet === expectedIds)
      }
    }
  }
}
