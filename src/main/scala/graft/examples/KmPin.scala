package graft.examples

import org.apache.spark.sql.SparkSession

import graft.operators.{KMeans, Similarity}

/** Dev probe: print fitted centroids for before/after comparison. */
object KmPin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val kTrue = 25
    val centers = Array.fill(kTrue, 64)(rnd.nextGaussian() * 0.5)
    val clustered = (0 until 2000).map { i =>
      val c = centers(rnd.nextInt(kTrue))
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.15).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val cp = Similarity.prepared(clustered, "embedding", "vec_id").cache()
    val km = KMeans.kmeansCentroids(cp, 64).orderBy("cent_id").collect()
    val h = km.map(r => (r.getInt(0), r.getSeq[Long](1).mkString(","), r.getLong(2)))
      .mkString("|").hashCode
    println(s"KMPIN hash=$h first=${km.head.getSeq[Long](1).take(6)} cn2_0=${km.head.getLong(2)}")
    spark.stop()
  }
}
