package graft.schema

import org.apache.spark.sql.types._

/** ClickHouse→Spark type algebra (SURVEY.md §1.2).
  *
  * The reference declares schemas in ClickHouse DDL
  * (/root/reference/types.json:6-19, /root/reference/create_db.py:67-128);
  * this ADT captures every type that DDL uses and renders it as a Spark
  * `StructField`, preserving lossy-mapping decisions as column metadata so
  * nothing is silently forgotten:
  *
  *   - `LowCardinality(T)` is an encoding hint, not a type — mapped to the
  *     inner type with `lowCardinality: true` metadata (Parquet dictionary
  *     encoding is the storage analog).
  *   - `Enum8(name→code)` becomes a validated String column carrying the
  *     full name↔code map in metadata; [[ChType.enumCheck]] builds the
  *     ingest-time check constraint.
  *   - Unsigned ints widen to the next signed Spark type (Spark has no
  *     unsigned); `UInt64` accepts range loss at the top bit, recorded as
  *     `unsigned: true` metadata.
  *   - `DateTime` is second-precision UTC in ClickHouse; columns are
  *     truncated to seconds at ingest ([[TsvProjection]]) and the session
  *     timezone is pinned to UTC (build.sbt).
  */
sealed trait ChType {
  def sparkType: DataType
  def metadata: Metadata = Metadata.empty
}

object ChType {
  case object ChString extends ChType { def sparkType: DataType = StringType }
  case object ChUInt8 extends ChType {
    def sparkType: DataType = ShortType
    override def metadata: Metadata =
      new MetadataBuilder().putBoolean("unsigned", true).build()
  }
  case object ChUInt32 extends ChType {
    def sparkType: DataType = LongType
    override def metadata: Metadata =
      new MetadataBuilder().putBoolean("unsigned", true).build()
  }
  case object ChUInt64 extends ChType {
    def sparkType: DataType = LongType
    override def metadata: Metadata = new MetadataBuilder()
      .putBoolean("unsigned", true).putBoolean("rangeLossAccepted", true).build()
  }
  case object ChInt8 extends ChType { def sparkType: DataType = ByteType }
  case object ChInt32 extends ChType { def sparkType: DataType = IntegerType }
  case object ChDateTime extends ChType { def sparkType: DataType = TimestampType }
  final case class ChLowCardinality(inner: ChType) extends ChType {
    def sparkType: DataType = inner.sparkType
    override def metadata: Metadata = new MetadataBuilder()
      .withMetadata(inner.metadata).putBoolean("lowCardinality", true).build()
  }
  final case class ChEnum8(values: Seq[(String, Int)]) extends ChType {
    def sparkType: DataType = StringType
    override def metadata: Metadata = new MetadataBuilder()
      .putStringArray("enumNames", values.map(_._1).toArray)
      .putLongArray("enumCodes", values.map(_._2.toLong).toArray)
      .build()
  }
  final case class ChArray(inner: ChType) extends ChType {
    def sparkType: DataType = ArrayType(inner.sparkType)
    // the element's lossy-mapping record (unsigned/enum/…) rides the
    // FIELD metadata, same as scalars — the renderer reads it back for
    // `Array(UInt32)` / Nested sub-field spellings
    override def metadata: Metadata = inner.metadata
  }

  // ---- the remainder of the scalar family (round-9 DDL parser, ChDdl):
  // same widen-unsigned / record-loss-as-metadata rules as above
  case object ChUInt16 extends ChType {
    def sparkType: DataType = IntegerType
    override def metadata: Metadata =
      new MetadataBuilder().putBoolean("unsigned", true).build()
  }
  case object ChInt16 extends ChType { def sparkType: DataType = ShortType }
  case object ChInt64 extends ChType { def sparkType: DataType = LongType }
  case object ChFloat32 extends ChType { def sparkType: DataType = FloatType }
  case object ChFloat64 extends ChType { def sparkType: DataType = DoubleType }
  case object ChBool extends ChType { def sparkType: DataType = BooleanType }
  case object ChDate extends ChType { def sparkType: DataType = DateType }
  final case class ChDecimal(precision: Int, scale: Int) extends ChType {
    def sparkType: DataType = DecimalType(precision, scale)
  }
  /** Fixed width is a storage property, not a Spark type — recorded. */
  final case class ChFixedString(n: Int) extends ChType {
    def sparkType: DataType = StringType
    override def metadata: Metadata =
      new MetadataBuilder().putLong("fixedLength", n.toLong).build()
  }
  /** Spark fields are nullable by default — Nullable is the inner type. */
  final case class ChNullable(inner: ChType) extends ChType {
    def sparkType: DataType = inner.sparkType
    override def metadata: Metadata = inner.metadata
  }

  /** CH `JSON` (and its `Dynamic`/legacy `Object('json')` kin): a
    * semi-structured column TYPE, not a string holding JSON text. Spark
    * 4's VariantType is the native carrier — a parsed binary encoding
    * whose typed paths extract with `variant_get` (the `JSONExtract*`
    * dialect mappings) instead of re-parsing text per call; parquet
    * stores it as the (metadata, value) variant group, the shredded-
    * column analog of CH's dynamic subcolumn storage.
    */
  case object ChJson extends ChType { def sparkType: DataType = VariantType }

  /** CH `AggregateFunction(fn, T…)` — a stored PARTIAL-STATE column (the
    * AggregatingMergeTree column type). `kind` is the engine-normalized
    * state kind ([[graft.catalog.Aggregating.kindOf]]'s vocabulary:
    * hll / kll / avg / sum / min / max / argmax / topk:N); `inners` are
    * the declared argument types. The SPARK storage type is the kind's
    * merge representation (the exact shapes
    * [[graft.catalog.Catalog]].stateMergeExprs folds):
    * binary sketches for hll/kll, a (value, count) map for topk, a
    * (sum, cnt) struct for avg, a (value, arg) struct for argMax
    * (value FIRST — the lexicographic-max trick needs the deciding field
    * leading), the widened scalar for sum, the scalar itself for min/max.
    * `fnText`/`argTexts` keep the DECLARED spelling so SHOW CREATE
    * renders `AggregateFunction(topK(10), String)` back verbatim.
    */
  final case class ChAggState(kind: String, inners: Seq[ChType],
                              fnText: String, argTexts: Seq[String])
      extends ChType {
    private def widened(t: ChType): DataType = t.sparkType match {
      case FloatType | DoubleType => DoubleType
      case _: org.apache.spark.sql.types.DecimalType => t.sparkType
      case _ => LongType
    }
    def sparkType: DataType = kind.split(':')(0) match {
      case "hll" | "kll" => BinaryType
      case "topk" => MapType(StringType, LongType)
      case "avg" => StructType(Seq(
        StructField("sum", widened(inners.head)),
        StructField("cnt", LongType)))
      case "sum" => widened(inners.head)
      case "min" | "max" => inners.head.sparkType
      // CH argMax(arg, val): inners = (Targ, Tval); value leads
      case "argmax" => StructType(Seq(
        StructField("value", inners(1).sparkType),
        StructField("arg", inners.head.sparkType)))
      case other => throw new IllegalArgumentException(
        s"AggregateFunction: unsupported state kind $other")
    }
    override def metadata: Metadata = new MetadataBuilder()
      .putString("aggKind", kind)
      .putString("aggFn", fnText)
      .putStringArray("aggArgs", argTexts.toArray)
      .build()
  }

  /** One declared column: position in the TSV is its index in the schema. */
  final case class Col(name: String, ch: ChType) {
    def field: StructField = StructField(name, ch.sparkType, nullable = true, ch.metadata)
  }

  def structType(cols: Seq[Col]): StructType = StructType(cols.map(_.field))
}
