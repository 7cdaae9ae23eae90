package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Privacy, Sampling}
import graft.similarity.Similarity

/** Codegen-ceiling audit (round-16 verdict item #2): round 16's probe
  * found `withIvfCell`'s literal codebook tripping Janino's 64 KB
  * method limit and silently running interpreted — a 29×-at-10×-data
  * scale killer found only by measurement. The same hazard SHAPE lives
  * wherever generated code grows with a config (literal chains, one
  * dot-loop per literal vector). This suite compiles each such family
  * at its MAX DOCUMENTED config with `spark.sql.codegen.fallback=false`
  * — a 64 KB bail (or any codegen failure) throws here instead of
  * silently degrading, so every ceiling below is a PROVEN ceiling.
  *
  * The argmin families (256×64 IVF, 16×256×4 PQ, 256×156 two-level)
  * are covered in CentroidArgMinSpec; this file audits the rest. */
class CodegenCeilingSpec extends SparkSpec {
  import spark.implicits._

  private def noFallback[A](f: => A): A = {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("withLshBucket at 64 planes x 64 dims (the full bitmask) compiles under codegen") {
    // one codegen'd DotProduct loop + when per plane; 64 is the hard
    // bitmask ceiling (1L << 63) and the largest config the operator
    // can ever see.
    noFallback {
      val planes = spark.range(1, 65).select(col("id").as("plane_rank"),
        transform(sequence(lit(0), lit(63)),
          i => sin(col("id") * 31 + i)).as("pv"))
      val vecs = spark.range(100).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => cos(col("id") * 7 + i)).as("v"))
      val b = Similarity.withLshBucket(vecs, col("vec_id"), col("v"),
        planes, col("plane_rank"), col("pv"))
      assert(b.count() == 100)
      // plane 64 sets bit 63 → buckets legitimately span the full signed
      // range; the codegen compile (fallback=false) is the assertion —
      // here just prove the projection computed real, varied bitmasks
      assert(b.select("bucket").distinct().count() > 1)
    }
  }

  test("randomProject to 32 output dims compiles under codegen") {
    // JL projects DOWN (d' = O(log n / eps^2) << d); 32-of-64 is past
    // any documented use. One dot loop per output dim.
    noFallback {
      val planes = Array.tabulate(32, 64)((p, i) => math.sin(p * 13 + i))
      val vecs = spark.range(100).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => cos(col("id") * 3 + i)).as("v"))
      val p = Similarity.randomProject(vecs, col("vec_id"), col("v"), planes)
      assert(p.count() == 100)
      assert(p.select(size(col("proj"))).distinct().as[Int].head() == 32)
    }
  }

  test("dpNoisyCounts at maxShift=64 (the require ceiling) compiles under codegen") {
    // the noise when-chain has 2*maxShift branches; 64 is the hard
    // require() ceiling in geometricThresholds.
    noFallback {
      val df = spark.range(1000).select((col("id") % 7).as("g"))
      val out = Privacy.dpNoisyCounts(df, Seq(col("g")), eps = 0.5,
        seed = "ceil-audit", maxShift = 64)
      assert(out.count() == 7)
      assert(out.filter(col("released") < 0).count() == 0)
    }
  }

  test("mixtureManifest over 64 sources compiles under codegen") {
    noFallback {
      val weights = (0 until 64).map(i => s"s$i" -> (1.0 + i * 0.25)).toMap
      val df = spark.range(2000).select(col("id").as("doc_id"),
        concat(lit("s"), (col("id") % 64).cast("string")).as("source"))
      val m = Sampling.mixtureManifest(df, col("doc_id"), col("source"), weights)
      assert(m.count() == 2000)
    }
  }
}
