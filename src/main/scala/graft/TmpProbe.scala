package graft
import org.apache.spark.sql.SparkSession
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config(Tables.RequiredConf).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables(spark, dir, "documents")
    println("docs scan partitions: " + docs.rdd.getNumPartitions)
    val sh = docs.select(org.apache.spark.sql.functions.col("doc_id")).localCheckpoint()
    println("narrow checkpoint partitions: " + sh.rdd.getNumPartitions)
    val li = Tables(spark, dir, "lineitem")
    println("lineitem scan partitions: " + li.rdd.getNumPartitions)
    spark.stop()
  }
}
