package graft.bench

import java.util.concurrent.atomic.AtomicLong

/** Machine-ceiling probe: pure extraction compute (no Spark, no I/O) on
  * plain JVM thread pools. Separates "our pipeline doesn't scale" from
  * "this VM's memory bandwidth saturates below 32 threads" (SURVEY.md §7.7).
  */
object CpuScaling {
  def main(args: Array[String]): Unit = {
    val nPages = if (args.nonEmpty) args(0).toInt else 40000
    val cfg = graft.pipeline.Ingest.Config()

    def run(threads: Int): Double = {
      val counter = new AtomicLong(0)
      val sink = new AtomicLong(0)
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { _ =>
        new Thread(() => {
          var i = counter.getAndIncrement()
          while (i < nPages) {
            val text = graft.fixtures.PagesGen.pageText(42L, i)
            val html = graft.fixtures.PagesGen.wrapHtml(s"Page $i", text)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val ex = graft.pipeline.Ingest.extractPage(s"u$i", "d", html, cfg)
            sink.addAndGet(ex.triples.size.toLong)
            i = counter.getAndIncrement()
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[cpu] threads=$threads%2d  ${nPages / wall}%8.1f docs/s  (sink=${sink.get()})")
      nPages / wall
    }

    run(4) // warmup
    val r1 = run(1)
    val r8 = run(8)
    val r32 = run(32)
    println(f"[cpu] speedup 8/1=${r8 / r1}%.2f  32/8=${r32 / r8}%.2f  32/1=${r32 / r1}%.2f")
  }
}
