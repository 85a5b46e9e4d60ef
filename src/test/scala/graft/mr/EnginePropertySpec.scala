package graft.mr

import graft.SparkSpec
import graft.core.KV

/** SURVEY §7.2 property: for randomly sampled (mapF, reduceF) pairs, the
  * distributed engine's output equals the in-memory sequential oracle's
  * (merged-group semantics). Map functions are seed-parameterized pure
  * closures; reduce functions are drawn from the shapes the reference's
  * apps use (count / sorted-join / max / first-after-sort).
  */
class EnginePropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(23)

  private def mkMap(seed: Int): (String, String) => Seq[KV] = {
    val mod = 3 + (seed % 5)
    val emitFile = seed % 2 == 0
    (file: String, contents: String) =>
      contents.split("\\s+").filter(_.nonEmpty).zipWithIndex.flatMap {
        case (tok, i) =>
          val key = s"k${(tok.length + i * seed) % mod}"
          if (emitFile) Seq(KV(key, tok), KV(s"f-$file", tok))
          else Seq(KV(key, s"$tok/${i % 7}"))
      }.toSeq
  }

  private val reducers: Seq[(String, Seq[String]) => String] = Seq(
    (_, vs) => vs.size.toString,                       // wc shape
    (_, vs) => vs.sorted.mkString(" "),                // crash/nocrash shape
    (_, vs) => s"${vs.size} ${vs.sorted.mkString(",")}", // indexer shape
    (_, vs) => vs.max,
    (k, vs) => s"$k=${vs.sorted.head}")

  test("engine == sequential oracle for sampled (mapF, reduceF) pairs") {
    import spark.implicits._
    val corpus = (1 to 6).map { f =>
      (s"file$f.txt",
        (1 to 30).map(_ => s"w${rnd.nextInt(12)}${"x" * rnd.nextInt(3)}")
          .mkString(" "))
    }
    val input = spark.createDataset(corpus).repartition(3)
    (1 to 10).foreach { trial =>
      val mapF = mkMap(rnd.nextInt(1000))
      val reduceF = reducers(rnd.nextInt(reducers.size))
      val got = MapReduce.run(input, mapF, reduceF)
        .collect().map(kv => kv.key -> kv.value).sorted.toSeq
      val exp = Sequential.run(corpus, mapF, reduceF)
        .map(kv => kv.key -> kv.value).sorted
      assert(got == exp, s"trial $trial diverged")
    }
  }
}
