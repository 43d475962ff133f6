package graft.meta

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Attribute metadata, mirroring the reference's external attributes file
  * (cf. /root/reference/src/program/Main.java:137-166): a name, a kind
  * (categorical `string` with a closed enumerated domain, or continuous
  * `numeric`), and for categorical attributes the value domain.
  *
  * The reference's type system is exactly these two scalar kinds
  * (SURVEY.md §1.2); the Spark engine keeps that model for C4.5 parity
  * while the rest of the engine works on arbitrary DataFrame schemas.
  */
case class AttrMeta(name: String, isNumeric: Boolean, domain: Seq[String] = Nil)

/** Full training-table schema: ordered attributes + the class column
  * (positionally last in the reference's TSV, cf. MyMapper.java:31,44)
  * with its closed label set. */
case class C45Schema(attrs: Seq[AttrMeta], classCol: String, classLabels: Seq[String]) {
  def attrNames: Seq[String] = attrs.map(_.name)
  def numericAttrs: Seq[AttrMeta] = attrs.filter(_.isNumeric)
  def categoricalAttrs: Seq[AttrMeta] = attrs.filterNot(_.isNumeric)
  def attrIndex(name: String): Int = attrNames.indexOf(name)
  def isNumericAttr(i: Int): Boolean = attrs(i).isNumeric

  /** Spark schema for reading the reference's TSV training table:
    * categorical → StringType, numeric → DoubleType, class last. */
  def toStructType: StructType = StructType(
    attrs.map(a =>
      StructField(a.name, if (a.isNumeric) DoubleType else StringType)) :+
      StructField(classCol, StringType))
}

object C45Schema {
  /** Parse the reference attributes-file grammar (Main.java:137-166):
    * each non-final line `name:kind[:v1,v2,...]` where kind `string`
    * carries an enumerated domain; the final line `class:l1,l2,...`
    * closes the class-label set. */
  def parse(lines: Seq[String]): C45Schema = {
    val clean = lines.map(_.trim).filter(_.nonEmpty)
    require(clean.nonEmpty, "empty attributes metadata")
    val attrs = clean.init.map { ln =>
      val parts = ln.split(":", -1)
      require(parts.length >= 2, s"bad attribute line: $ln")
      val numeric = parts(1) != "string"
      AttrMeta(parts(0), numeric,
        if (numeric) Nil else parts(2).split(",").toIndexedSeq)
    }
    val last = clean.last.split(":", -1)
    C45Schema(attrs, last(0), last(1).split(",").toIndexedSeq)
  }

  def parseFile(path: String): C45Schema = {
    import scala.jdk.CollectionConverters._
    parse(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala.toSeq)
  }

  /** Infer a C45 schema from a DataFrame: numeric dtypes → numeric
    * attribute, string → categorical (domain left empty; the fit loop
    * discovers observed values from data). `classCol` names the label. */
  def fromDataFrame(df: DataFrame, classCol: String): C45Schema = {
    val attrs = df.schema.fields.filterNot(_.name == classCol).map { f =>
      val numeric = f.dataType match {
        case _: NumericType => true
        case _ => false
      }
      AttrMeta(f.name, numeric)
    }
    require(df.schema.fieldNames.contains(classCol), s"missing class column $classCol")
    C45Schema(attrs.toIndexedSeq, classCol, Nil)
  }
}
