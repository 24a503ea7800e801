package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Scan-optimized parquet layout writer (engine extension): range-partition
  * by a sort key and sort within each partition before writing, so every
  * output file covers a DISJOINT key range. Parquet footers then carry
  * tight min/max stats per file and per row group, and any reader filtering
  * on the key prunes whole files without opening them — the data-skipping
  * layout (a 1-D Z-order) that turns a 100 TB table scan into a few-file
  * read for selective predicates.
  *
  * `repartitionByRange` samples the key to build balanced range bounds
  * (one extra pass over a sample, one full shuffle — the write-side cost
  * buying every future scan's pruning); the in-partition sort makes row
  * groups internally ordered so min/max prune at row-group granularity too.
  */
object LayoutSink {

  def writeRangeLayout(df: DataFrame, keyCol: String, numFiles: Int,
                       path: String): Unit = {
    require(numFiles > 0)
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
