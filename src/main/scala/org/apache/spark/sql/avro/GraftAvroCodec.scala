package org.apache.spark.sql.avro

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Graft's Avro per-record message codec (the Kafka payload shape).
  *
  * This Spark distribution bundles the Avro FILE format machinery in
  * spark-sql (`AvroFileFormat`, `AvroSerializer`/`AvroDeserializer`,
  * `SchemaConverters`) but not the connector module that carries the
  * `to_avro`/`from_avro` expressions — calling those built-ins throws
  * `AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE`. These two expressions
  * close that gap on top of the bundled (package-private, hence this
  * file's package) serializer classes, following the same design the
  * public spark-avro connector uses for `CatalystDataToAvro` /
  * `AvroDataToCatalyst`: per-expression reusable encoder/decoder state
  * (safe — each task deserializes its own plan copy), eval routed
  * through an `addReferenceObj` call so the expression stays inside
  * the WholeStageCodegen span rather than falling back to interpreted
  * projection.
  */
case class GraftAvroEncode(child: Expression, jsonSchema: String)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

  @transient private lazy val avroType: Schema =
    new Schema.Parser().parse(jsonSchema)
  @transient private lazy val serializer =
    new AvroSerializer(child.dataType, avroType, child.nullable)
  @transient private lazy val writer =
    new GenericDatumWriter[Any](avroType)
  @transient private var encoder: BinaryEncoder = _
  @transient private lazy val out = new ByteArrayOutputStream()

  override def nullSafeEval(input: Any): Any = {
    out.reset()
    encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
    writer.write(serializer.serialize(input), encoder)
    encoder.flush()
    out.toByteArray
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAvroEncode", this)
    defineCodeGen(ctx, ev, input => s"(byte[]) $ref.nullSafeEval($input)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftAvroEncode =
    copy(child = newChild)
}

/** Inverse of [[GraftAvroEncode]]: binary Avro message → Catalyst
  * value of `outType`, decoded with the writer schema (`jsonSchema`),
  * i.e. the schema-registry contract where reader == writer schema.
  */
case class GraftAvroDecode(child: Expression, jsonSchema: String, outType: DataType)
    extends UnaryExpression {

  override def dataType: DataType = outType
  override def nullable: Boolean = true

  @transient private lazy val avroType: Schema =
    new Schema.Parser().parse(jsonSchema)
  @transient private lazy val reader =
    new GenericDatumReader[Any](avroType)
  // datetime rebase CORRECTED: messages are written by this engine's
  // own encoder (proleptic Gregorian), never by legacy Spark 2.x
  @transient private lazy val deserializer =
    new AvroDeserializer(avroType, outType, "CORRECTED",
      false, "_", -1)
  @transient private var decoder: BinaryDecoder = _
  @transient private var record: Any = _

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
    record = reader.read(record, decoder)
    deserializer.deserialize(record).getOrElse(null)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftAvroDecode", this)
    val obj = ctx.freshName("avroDecoded")
    nullSafeCodeGen(ctx, ev, input => s"""
      Object $obj = $ref.nullSafeEval($input);
      if ($obj == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = (${org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(dataType)}) $obj;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): GraftAvroDecode =
    copy(child = newChild)
}

/** Public surface for the codec + the schema derivation the producer
  * side needs (Catalyst type → Avro writer schema JSON).
  */
object GraftAvroCodec {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.GraftColumnBridge.{column, expression}

  def toAvroBinary(c: Column, jsonSchema: String): Column =
    column(GraftAvroEncode(expression(c), jsonSchema))

  def fromAvroBinary(c: Column, jsonSchema: String, outType: DataType): Column =
    column(GraftAvroDecode(expression(c), jsonSchema, outType))

  /** Writer schema for a Catalyst type (what a producer registers). */
  def writerSchemaFor(t: DataType, recordName: String): String =
    SchemaConverters.toAvroType(t, nullable = false, recordName).toString
}
