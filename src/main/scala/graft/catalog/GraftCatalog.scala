package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource-v2 TableCatalog over a graft warehouse: plug it into a
  * session and the full SQL surface addresses lake tables directly —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/warehouse")
  * spark.sql("SELECT * FROM graft.users JOIN graft.orders ...")
  * spark.sql("INSERT INTO graft.raw_events SELECT ...")   // plain append
  * }}}
  *
  * Reads/writes delegate to Spark's own v2 parquet machinery
  * (vectorized scan, pushdown, partition pruning) under the registry's
  * logical schema — so widened columns read correctly. MERGE/evolution
  * semantics stay with the engine API ([[GraftLake]]); SQL INSERT is a raw
  * append (no `_inserted_at` injection — documented).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var warehouse: String = _

  private def spark = SparkSession.active
  private def lake = new GraftLake(spark, warehouse)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireRootNamespace(namespace)
    lake.listTables().map(t => Identifier.of(Array.empty, t)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    requireRootNamespace(ident.namespace())
    if (!lake.tableExists(ident.name))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        Seq(catalogName, ident.name))
    val meta = lake.readMeta(ident.name)
    val full = StructType(
      meta.schema.fields.toSeq ++ GraftLake.partitionFields(meta))
    val parquet = ParquetTable(
      ident.name,
      spark,
      new CaseInsensitiveStringMap(Map("path" -> dataDir(ident)).asJava),
      Seq(dataDir(ident)),
      Some(full),
      classOf[ParquetFileFormat])
    // v2 file writes know nothing about graft's expression partitioning —
    // a SQL INSERT on a partitioned table would drop flat files into the
    // hive layout and corrupt it. Partitioned tables are read-only via
    // SQL; writes go through the engine (GraftLake / IngestPipeline).
    if (meta.partitions.isEmpty) parquet
    else new ReadOnlyTable(parquet)
  }

  /** Read-only facade: delegates scans, refuses the write capability. */
  private final class ReadOnlyTable(underlying: ParquetTable)
      extends Table with SupportsRead {
    override def name(): String = underlying.name
    override def schema(): StructType = underlying.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap) =
      underlying.newScanBuilder(options)
    override def partitioning(): Array[Transform] = underlying.partitioning()
    override def properties(): util.Map[String, String] = underlying.properties()
  }

  private def dataDir(ident: Identifier): String =
    s"$warehouse/${ident.name}/data"

  override def createTable(
      ident: Identifier,
      columns: Array[Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    requireRootNamespace(ident.namespace())
    require(partitions.isEmpty,
      "use the 'partitions' table property (graft expression partitioning) " +
        "or the GraftLake API; SQL PARTITIONED BY is not mapped")
    val schema = StructType(columns.toSeq.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
    val props = properties.asScala
    val noSys = StructType(schema.filterNot(_.name == "_inserted_at"))
    lake.createTable(ident.name, noSys,
      partitions = props.get("partitions").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil),
      pks = props.get("pks").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "schema evolution is engine-driven (GraftLake.ensureTable); ALTER TABLE is not exposed")

  override def dropTable(ident: Identifier): Boolean = {
    requireRootNamespace(ident.namespace())
    val existed = lake.tableExists(ident.name)
    if (existed) lake.dropTable(ident.name)
    existed
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename is not supported")

  private def requireRootNamespace(namespace: Array[String]): Unit =
    require(namespace.isEmpty, s"graft catalog has a single flat namespace")

  // -- SupportsNamespaces (flat root namespace only) --
  override def listNamespaces(): Array[Array[String]] = Array(Array.empty)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireRootNamespace(namespace); Array.empty
  }
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    requireRootNamespace(namespace); Map.empty[String, String].asJava
  }
  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("flat namespace")
  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("flat namespace")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("flat namespace")
}
