package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark

/** Property invariants for the text-curation operators. */
object LlmPropertiesSpec extends Properties("llm") {

  // Spark jobs per case are expensive; 10 diverse cases per property suffice.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val tokGen = Gen.oneOf("a", "b", "c", "dd", "e")

  // The sorted-run fold IS the term frequency: for arbitrary token bags the
  // narrow no-shuffle formulation must equal the textbook count (the same
  // equality the DuckDB oracle checks, here over adversarial inputs).
  property("repetition fold == brute-force max term frequency") =
    Prop.forAll(Gen.nonEmptyListOf(tokGen).map(_.take(30))) { toks =>
      val expectMax = toks.groupBy(identity).values.map(_.size).max
      val expectDistinct = toks.distinct.size
      val row = TextOps.repetition(Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"))
        .select("n_words", "max_tok_freq", "dup_word_frac").head()
      row.getLong(0) == toks.size &&
        row.getLong(1) == expectMax &&
        math.abs(row.getDouble(2) - (1.0 - expectDistinct.toDouble / toks.size)) < 1e-12
    }

  // Chunking invariants for arbitrary documents and (size, overlap) configs:
  // starts advance by exactly the stride from 1, every token lands in at
  // least one chunk (the last chunk reaches the document end), and every
  // chunk except short tails carries exactly `size` tokens.
  property("chunking covers every token with stride-spaced starts") =
    Prop.forAll(
      Gen.nonEmptyListOf(tokGen).map(_.take(200)),
      Gen.chooseNum(2, 20),
      Gen.chooseNum(0, 10)) { (toks, size, rawOverlap) =>
      val overlap = math.min(rawOverlap, size - 1)
      val stride = size - overlap
      val n = toks.size
      val chunks = TextOps.chunkDocs(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), size, overlap)
        .select("chunk_id", "start_token", "n_tokens")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toList
      val startsOk = chunks.zipWithIndex.forall { case ((id, start, _), i) =>
        id == i && start == 1L + i.toLong * stride
      }
      val sizesOk = chunks.forall { case (_, start, len) =>
        len == math.min(size.toLong, n - start + 1)
      }
      val covered = chunks.map { case (_, s, l) => s + l - 1 }.max == n.toLong
      startsOk && sizesOk && covered && chunks.head._2 == 1L
    }

  // The distributed pointer-jumping label propagation must produce the same
  // components as the driver union-find on ARBITRARY graphs — random edge
  // lists with self-loops, duplicates and many small/joined components, the
  // shapes the chain spec can't cover. Both paths must also agree with a
  // reference union-find computed in plain Scala.
  property("connectedComponents: distributed path == union-find on random graphs") =
    Prop.forAll(Gen.listOfN(40, Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)))) { es =>
      val edges = es.toDF("src", "dst")
      val viaUnionFind = TextOps.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      val viaDistributed = TextOps.connectedComponents(edges, broadcastEdgeLimit = 0L)
        .as[(Long, Long)].collect().toMap
      // plain-Scala reference
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      viaUnionFind == expect && viaDistributed == expect
    }
}
