package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, JsonToStructs, Literal}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.qbo.Schemas

/** DataSource V2 implementation of the QBO entity-query source
  * (SURVEY §2.1 S2-S4): `spark.read.format("qbo").option("entity",
  * "Bill")`.
  *
  * Architecture (the point of doing this as DSv2 rather than a driver
  * loop):
  *  - each API page is one [[InputPartition]] → page fetches/parses run
  *    in parallel executor tasks, not serially on the driver (the
  *    reference pages serially at 100 rows/request);
  *  - column pruning is pushed into the source
  *    ([[SupportsPushDownRequiredColumns]]): the JSON parser only
  *    materializes requested fields — and a live Reports-API client
  *    would translate the same pruned schema into the `columns=` query
  *    parameter (S7, the reference's only server-side projection);
  *  - page JSON → [[InternalRow]] via Catalyst's own `JsonToStructs`,
  *    so parsing semantics match `from_json` exactly.
  *
  * Offline backends register page lists in [[QboPageFeeds]] (option
  * `feed`); a live HTTP backend would implement the same page-iterator
  * contract against `/v3/company/{realm}/query`.
  */
class QboDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "qbo"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QboDataSource.schemaFor(options.get("entity"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new QboTable(schema, properties.get("entity"), properties.get("feed"))
}

object QboDataSource {
  def schemaFor(entity: String): StructType = entity match {
    case "Bill" => Schemas.bill
    case "BillPayment" => Schemas.billPayment
    case "JournalEntry" => Schemas.journalEntry
    case "Purchase" => Schemas.purchase
    case "Deposit" => Schemas.deposit
    case other => throw new IllegalArgumentException(s"unknown entity: $other")
  }
}

/** Named offline page feeds (fixture-backed "API"). */
object QboPageFeeds {
  private val feeds = scala.collection.concurrent.TrieMap[String, Seq[String]](
    "bills" -> graft.qbo.Fixtures.billPages,
    "billpayments" -> graft.qbo.Fixtures.billPaymentPages,
    "journalentries" -> graft.qbo.Fixtures.journalEntryPages,
    "purchases" -> graft.qbo.Fixtures.purchasePages,
    "deposits" -> graft.qbo.Fixtures.depositPages)

  def register(name: String, pages: Seq[String]): Unit = feeds.put(name, pages)
  def pages(name: String): Seq[String] =
    feeds.getOrElse(name,
      throw new IllegalArgumentException(s"unknown feed: $name"))
}

class QboTable(schema: StructType, entity: String, feed: String)
    extends Table with SupportsRead {
  override def name(): String = s"qbo/$entity"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QboScanBuilder(schema, entity, feed)
}

class QboScanBuilder(fullSchema: StructType, entity: String, feed: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var prunedSchema: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // top-level pruning: keep the source's field order for determinism
    prunedSchema = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = prunedSchema
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      QboPageFeeds.pages(feed).toArray.map(p =>
        QboPagePartition(entity, p): InputPartition)
    override def createReaderFactory(): PartitionReaderFactory =
      new QboReaderFactory(entity, prunedSchema)
  }
}

case class QboPagePartition(entity: String, pageJson: String) extends InputPartition

class QboReaderFactory(entity: String, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[QboPagePartition]
    new PartitionReader[InternalRow] {
      // Catalyst's own JSON parser → from_json-identical semantics.
      private val toStruct = JsonToStructs(schema, Map.empty,
        BoundReference(0, StringType, nullable = true)).withTimeZone("UTC")
      private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      private val iter: Iterator[String] = {
        val mapper = new ObjectMapper()
        val arr = mapper.readTree(p.pageJson).path("QueryResponse").path(entity)
        if (arr.isArray) arr.elements().asScala.map(_.toString).toSeq.iterator
        else Iterator.empty
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (iter.hasNext) {
          row.update(0, UTF8String.fromString(iter.next()))
          current = toStruct.eval(row).asInstanceOf[InternalRow]
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
