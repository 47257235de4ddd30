package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Runs the bench-diff attribution regression cases
  * (`tools/test_bench_diff.py`) under `sbt test`, so the frozen
  * semantics of the round-over-round performance lens gate the build
  * like every Scala invariant — the tool's failure mode is a WRONG
  * performance story (a code-global regression read as machine drift,
  * or the reverse), which no Spark-side spec can catch. Plain
  * stdlib python; cancels (not fails) when no python3 is on PATH so
  * the suite stays green on a Scala-only box.
  */
class BenchDiffToolSpec extends AnyFunSuite {

  test("bench_diff attribution semantics: all frozen cases pass") {
    val python = Seq("python3", "python").find { p =>
      try {
        new ProcessBuilder(p, "--version").start().waitFor() == 0
      } catch { case _: java.io.IOException => false }
    }
    assume(python.nonEmpty, "no python interpreter on PATH")
    val script = new java.io.File("tools/test_bench_diff.py")
    assert(script.isFile, s"missing ${script.getPath} (run from repo root)")
    val pb = new ProcessBuilder(python.get, script.getPath)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val code = proc.waitFor()
    assert(code == 0, s"test_bench_diff.py exited $code:\n$out")
    assert(out.contains("all cases passed"), out)
  }
}
