package graft.tools
import graft._
import org.apache.spark.sql.functions._
import graft.sim.Similarity
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.load(spark, sf, "embeddings").localCheckpoint()
      val qs = emb.filter(col("vec_id") < 10)
      def tk(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id","neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = tk(Similarity.cosineTopK(emb, qs, "vec_id", "embedding", k = 10))
      for (np <- Seq(5,6,7)) {
        val ivf = tk(Similarity.ivfCosineTopK(emb, "vec_id", "embedding", k = 10, nlist = 8, nprobe = np)
          .filter(col("query_id") < 10))
        println(s"$sf nprobe=$np recall=${(ivf & exact).size.toDouble / exact.size}")
      }
    }
    spark.stop()
  }
}
