package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.catalog.{GraftCatalog, GraftLake}

/** Shared option-resolution for the `graft-cdf` source and the `graft`
  * sink: a stream addresses its table either by explicit
  * `warehouse` + bare `table`, or by a CATALOG-QUALIFIED
  * `table = <graft-catalog>.<name>` resolved through the session's
  * DSv2 catalog manager — the same registration `spark.sql` queries use
  * (`spark.sql.catalog.<name> = GraftCatalog`), so streaming and SQL
  * address tables identically. */
private[streaming] object GraftStreamAddress {

  def resolve(spark: SparkSession, who: String,
      warehouse: Option[String], table: String): (GraftLake, String) =
    warehouse match {
      case Some(wh) =>
        require(!table.contains('.'),
          s"$who: pass EITHER warehouse + bare table, or a " +
            s"catalog-qualified table — got both warehouse and '$table'")
        (new GraftLake(spark, wh), table)
      case None =>
        val parts = table.split('.')
        require(parts.length == 2,
          s"$who needs either the 'warehouse' option, or " +
            s"table = <graft-catalog>.<name> (got '$table')")
        val cat = try org.apache.spark.sql.graft.PlanBridge
          .catalogManager(spark).catalog(parts(0))
        catch {
          case _: org.apache.spark.sql.connector.catalog
              .CatalogNotFoundException =>
            throw new IllegalArgumentException(
              s"$who: '${parts(0)}' is not a registered catalog " +
                s"(spark.sql.catalog.${parts(0)} is unset)")
        }
        cat match {
          case g: GraftCatalog => (new GraftLake(spark, g.warehouseDir), parts(1))
          case other => throw new IllegalArgumentException(
            s"$who: catalog '${parts(0)}' is ${other.getClass.getSimpleName}, " +
              "not a graft catalog")
        }
    }
}
