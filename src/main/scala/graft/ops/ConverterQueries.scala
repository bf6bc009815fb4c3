package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.dump.{DumpConverter, DumpRenderer}

/** The converter as an oracle-checked query: render a deterministic
  * mysqldump from the driver's own parquet fixtures, run the full
  * distributed convert (statement assembly → parse → coerce → parquet),
  * and read the result back. The DuckDB oracle reads the ORIGINAL
  * parquet — so a hash match proves the dump→parquet pipeline is
  * value-exact end-to-end (modulo the documented INT→BIGINT widening
  * of the reference's type system, reproduced in the oracle via CAST).
  */
object ConverterQueries {

  val conv_dump_roundtrip: (SparkSession, String) => DataFrame = (s, d) => {
    val in = Files.createTempDirectory("graft-dump-in")
    val out = Files.createTempDirectory("graft-dump-out")
    val text = DumpRenderer.dump(Seq(
      DumpRenderer.section("nation", Tables.nation(s, d), Seq("n_nationkey")),
      DumpRenderer.section("region", Tables.region(s, d), Seq("r_regionkey")),
    ), batchSize = 10)
    Files.writeString(in.resolve("dump.sql"), text)
    DumpConverter.convert(s, in.resolve("dump.sql").toString, out.toString, minPartitions = 4)
    val nation = s.read.parquet(s"$out/nation")
    val region = s.read.parquet(s"$out/region")
    nation.join(region, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("r_name"))
      .orderBy(col("n_nationkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "conv_dump_roundtrip" -> conv_dump_roundtrip,
  )

  val oracles: Map[String, String] = Map(
    "conv_dump_roundtrip" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        |  CAST(n_regionkey AS BIGINT) AS n_regionkey, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,
  )
}
