package graft

import java.nio.file.{Files, Paths}

/** Decode a bench artifact's per-query payload to ONE plain JSON map —
  * measurement tooling for the optimization rounds (VERDICT r21 #2: the
  * driver's PERF comparisons have been empty since r11 because nothing
  * downstream decodes the g36/tokenDict-compressed `queries_ms` line;
  * every judge has re-implemented the decoder by hand). Reads a file
  * (BENCH_rNN.json, a bench stdout log, anything containing the g36 /
  * grp / flat payloads) and prints `{"q_name": ms, ...}` using the SAME
  * parser the bench's own drift guards use (BenchGuards.
  * parsePriorQueriesMs — one decode implementation, zero copies).
  * Usage: runMain graft.DecodeBench <file> */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse {
      System.err.println("usage: DecodeBench <artifact-or-log file>")
      sys.exit(2)
    }
    val text = Files.readString(Paths.get(path))
    val ms = BenchGuards.parsePriorQueriesMs(text)
    if (ms.isEmpty) {
      System.err.println(s"[decode] no per-query payload found in $path")
      sys.exit(1)
    }
    println(ms.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}"))
  }
}
