package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.MultimodalOps

/** Scale-stress harness for the media near-dup family (q87's image
  * pipeline, the shared [[MultimodalOps.hammingNearDup]] band join):
  * synthesize a ladder of deterministic 16×16 grayscale PNGs (REAL
  * ImageIO encode→decode on both sides of the hash — the codec cost is
  * part of the workload, exactly as at 100 TB), aHash every payload,
  * band-join pairs at radius ≤ 3, and print one JSON line per-rung with
  * wall-clock and pair counts. Every even/odd id pair shares a base
  * image with 3 perturbed pixels — n/2 planted near-dup pairs (random
  * cross-pairs over ~uniform 64-bit hashes are vanishingly rare).
  * NOTE the perturbation also shifts the GLOBAL mean slightly, so
  * ~3% of planted twins land at hamming 4–6 (measured): the radius-3
  * count finds ~97% of n/2 by design, and a SECOND pass at radius 6
  * (auto 8×8-bit bands — the nChunks generalization) recovers the
  * tail; both counts print, so the run measures the two tiers'
  * recall split as well as their cost.
  *
  * The plan shape under stress is the scale claim: hash = one narrow
  * mapPartitions decode pass; pairs = band explode (4 rows/image) →
  * equi-join on (band, value) → popcount verify — never an all-pairs
  * product, so cost grows with collision volume (n²/2¹⁶ per band),
  * not n².
  *
  * Usage: sbt "runMain graft.tools.StressMedia [nImages[,nImages...]]"
  * (default ladder 50000,200000,800000).
  */
object StressMedia {
  def main(args: Array[String]): Unit = {
    val ladder = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(50000L, 200000L, 800000L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-stress-media")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpus(n: Long) =
      spark.range(n).repartition(cpus * 2).as[Long].mapPartitions { it =>
        it.map { id =>
          val base = id / 2
          val perturb = id % 2 == 1
          val img = new java.awt.image.BufferedImage(16, 16,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              // murmur-style finalizer: genuinely distinct content per
              // (base, pixel) — a linear-in-base formula is just a
              // constant luminance shift, which aHash (mean-relative by
              // design) maps to the SAME hash for every base
              var s = base * 6364136223846793005L +
                (x * 16 + y) * 1442695040888963407L
              s ^= s >>> 33; s *= 0xff51afd7ed558ccdL; s ^= s >>> 33
              var v = (s & 0xff).toInt
              if (perturb && y == 0 && x < 3) v = (v + 128) % 256
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }.toDF("doc_id", "payload")

    val results = ladder.map { n =>
      val t0 = System.nanoTime()
      val hashed = MultimodalOps.imageAHash(corpus(n)).toDF()
        .filter(col("ok")).persist()
      val nHashed = hashed.count()
      val tHash = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = MultimodalOps.imageNearDup(hashed, col("doc_id"),
        col("ahash"), maxHamming = 3).count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val pairs6 = MultimodalOps.imageNearDup(hashed, col("doc_id"),
        col("ahash"), maxHamming = 6).count()
      val tPairs6 = (System.nanoTime() - t2) / 1e9
      hashed.unpersist()
      System.err.println(
        f"[stress-media] n=$n%8d hashed=$nHashed%8d (${tHash}%6.1f s codec+hash)" +
          f"  r3=$pairs%8d (${tPairs}%5.1f s, 4 bands)" +
          f"  r6=$pairs6%8d (${tPairs6}%5.1f s, 8 bands)")
      (n, nHashed, tHash, pairs, tPairs, pairs6, tPairs6)
    }
    val json = results.map { case (n, h, th, p, tp, p6, tp6) =>
      f"""{"n":$n,"hashed":$h,"hash_sec":$th%.1f,"pairs_r3":$p,""" +
        f""""pair_sec_r3":$tp%.1f,"pairs_r6":$p6,"pair_sec_r6":$tp6%.1f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stress_media","ladder":$json}""")
    spark.stop()
  }
}
