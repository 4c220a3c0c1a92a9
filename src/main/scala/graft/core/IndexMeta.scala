package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.MetadataBuilder

/** Build-parameter stamp for index frames (IVF assignments, PQ code
  * frames).
  *
  * The `*FromIndex` serving paths re-derive centroids/codebooks from
  * the corpus using the CALL's knobs; an index built under different
  * knobs (or for a different corpus column) would silently mismatch —
  * cent_ids point at other centroids, codes decode against the wrong
  * codebook — and produce wrong results with no error. The builders
  * therefore stamp their knobs into the anchor column's metadata
  * (which survives the IndexStore parquet round-trip: Spark persists
  * column metadata in the parquet footer's schema JSON), and the
  * serving paths validate the stamp against their own knobs before
  * scanning. Hand-assembled frames without a stamp are accepted — the
  * stamp guards the built artifacts, it is not a capability gate.
  */
object IndexMeta {
  private val Key = "graft_index_params"

  private def canonical(params: Seq[(String, Any)]): String = {
    // [[get]] splits the stamp on ';' and the first '=' — reject
    // values that would alias under that framing at TAG time (an
    // exotic column name containing ';' would otherwise parse into
    // garbage keys at serve time while validate(), which compares
    // whole strings, kept passing)
    params.foreach { case (k, v) =>
      require(!k.contains(";") && !k.contains("="),
        s"index param name '$k' may not contain ';' or '='")
      require(!v.toString.contains(";"),
        s"index param $k='$v' may not contain ';'")
    }
    params.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(";")
  }

  /** Stamp `params` into `anchorCol`'s column metadata. */
  def tag(df: DataFrame, anchorCol: String, params: (String, Any)*): DataFrame = {
    val merged = new MetadataBuilder()
      .withMetadata(df.schema(anchorCol).metadata)
      .putString(Key, canonical(params))
      .build()
    df.withColumn(anchorCol, col(anchorCol).as(anchorCol, merged))
  }

  /** The stamped build parameters of an index frame, if any — lets a
    * serving path recover build-time RESOLVED values (e.g. an
    * auto-derived centroid count) without re-deriving them from the
    * source.
    */
  def get(df: DataFrame, anchorCol: String): Option[Map[String, String]] =
    df.schema.find(_.name == anchorCol).map(_.metadata)
      .filter(_.contains(Key)).map(_.getString(Key))
      .map(_.split(";").filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        kv.take(i) -> kv.drop(i + 1)
      }.toMap)

  /** Fail loudly when a stamped index frame disagrees with the
    * serving call's knobs; frames without a stamp pass.
    */
  def validate(df: DataFrame, anchorCol: String, what: String,
      params: (String, Any)*): Unit = {
    val meta = df.schema.find(_.name == anchorCol).map(_.metadata)
    meta.filter(_.contains(Key)).map(_.getString(Key)).foreach { stored =>
      val expected = canonical(params)
      require(stored == expected,
        s"$what: index was built with ($stored) but is being served " +
          s"with ($expected) — rebuild the index or match the knobs")
    }
  }
}
