package graft.cli

import graft.analysis.{Analyzer, StopWords}
import graft.codec.{Postings, VByte}
import graft.ref.OracleBm25

/** Tiny CLI surface over the pure core: analyze + score + rank the
  * reference sample corpus (samples/BM25Sample/Program.cs:10-22) for a
  * query passed as argv. Usage: runMain graft.cli.Demo "quick brown fox" [topN]
  */
object Demo {
  val sampleCorpus: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog.",
    "The fox",
    "The dog",
    "A brown dog jumps over another dog.",
    "The quick brown fox.",
    "Machine learning is a subset of artificial intelligence.",
    "Natural language processing helps computers understand human language.",
    "The algorithm processes documents efficiently.",
    "Information retrieval systems rank documents by relevance.",
    "Text mining extracts useful information from unstructured data.")

  def main(args: Array[String]): Unit = {
    val query = args.headOption.getOrElse("quick brown fox")
    val topN = args.lift(1).map(_.toInt).getOrElse(5)
    println(s"query: '$query'  topN=$topN")
    println(s"query tokens: ${Analyzer.tokenizeEn(query).mkString(", ")}")
    val top = OracleBm25.rank(query, sampleCorpus, topN, StopWords.english)
    if (top.isEmpty) println("(no results)")
    top.zipWithIndex.foreach { case ((docIdx, score), r) =>
      println(f"#${r + 1} score=$score%.4f doc[$docIdx] ${sampleCorpus(docIdx)}")
    }
    // codec smoke: encode/decode a posting list through the public codec
    val docs = Array(3L, 10L, 11L, 400L, 100000L)
    val p = Postings.encode(0, "fox", docs, Array(1, 2, 1, 3, 1), Array(9, 2, 2, 8, 9))
    val (d2, t2, _) = Postings.decode(p)
    println(s"codec roundtrip: ${d2.mkString(",")} tfs=${t2.mkString(",")} " +
      s"bytes=${p.docsBlob.length}+${p.tfsBlob.length} (raw would be ${8 * docs.length + 4 * docs.length})")
    val g = VByte.decodeDeltas(VByte.encodeDeltas(docs), docs.length)
    assert(g.sameElements(docs))
  }
}
