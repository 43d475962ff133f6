package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One edge condition on a tree path. The reference stores these as raw
  * strings inside `Rule.conditions` — categorical `"v"`, numeric
  * `"<=B"` / `">B"` (cf. /root/reference/src/type/Rule.java:12 and
  * Main.java:244-246) — and re-parses them per record with a truncating
  * substring (MyMapper.java:95-108, SURVEY.md quirk #1). We keep a typed
  * ADT and compile to a Catalyst predicate, so numeric comparison is a
  * real `<=` on doubles, never string round-tripping. */
sealed trait Split {
  /** Compile against the attribute's Column. */
  def toPredicate(attr: Column): Column
  /** Reference wire format for the condition value. */
  def encoded: String
}
final case class CatEq(v: String) extends Split {
  def toPredicate(attr: Column): Column = attr === lit(v)
  def encoded: String = v
}
final case class NumLE(b: Double) extends Split {
  def toPredicate(attr: Column): Column = attr <= lit(b)
  def encoded: String = s"<=$b"
}
final case class NumGT(b: Double) extends Split {
  def toPredicate(attr: Column): Column = attr > lit(b)
  def encoded: String = s">$b"
}
object Split {
  /** Inverse of [[Split.encoded]]. Accepts the reference's grammar. */
  def decode(s: String): Split =
    if (s.startsWith("<=")) NumLE(s.substring(2).toDouble)
    else if (s.startsWith(">")) NumGT(s.substring(1).toDouble)
    else CatEq(s)
}

/** A conjunctive root-to-leaf path condition plus (for closed rules) the
  * predicted label — the reference's central model object
  * (/root/reference/src/type/Rule.java:7-57). Conditions are ordered
  * (attrIndex, Split) pairs; `label == None` means the rule is still
  * open (a growing frontier node). */
final case class Rule(conditions: Vector[(Int, Split)], label: Option[String] = None) {
  def usedAttrs: Set[Int] = conditions.iterator.map(_._1).toSet
  def isOpen: Boolean = label.isEmpty
  def depth: Int = conditions.length

  /** The conjunctive predicate as a single Catalyst Column
    * (reference `isFitRule`, MyMapper.java:89-116 — minus quirk #1). */
  def toPredicate(attrNames: Seq[String]): Column =
    if (conditions.isEmpty) lit(true)
    else conditions.map { case (i, s) => s.toPredicate(col(attrNames(i))) }
      .reduce(_ && _)

  def withCondition(attr: Int, s: Split): Rule =
    copy(conditions = conditions :+ (attr -> s))
  def closed(l: String): Rule = copy(label = Some(l))

  /** Reference text codec `aid1,v1&aid2,v2:label` (Rule.java:22-33).
    * Unlike the reference (which throws on a condition-less rule,
    * Rule.java:29) we emit `:label` for the root. */
  def encode: String =
    conditions.map { case (i, s) => s"$i,${s.encoded}" }.mkString("&") +
      ":" + label.getOrElse("")
}

object Rule {
  val root: Rule = Rule(Vector.empty, None)

  /** Inverse of [[Rule.encode]] (reference `Rule.parse`,
    * Rule.java:37-56): grammar `conds:label` where conds is
    * `&`-separated `aid,value` pairs, either side possibly empty. */
  def decode(s: String): Rule = {
    val cut = s.lastIndexOf(':')
    require(cut >= 0, s"bad rule encoding: $s")
    val condsStr = s.substring(0, cut)
    val labelStr = s.substring(cut + 1)
    val conds =
      if (condsStr.isEmpty) Vector.empty[(Int, Split)]
      else condsStr.split("&").toVector.map { part =>
        val comma = part.indexOf(',')
        part.substring(0, comma).toInt -> Split.decode(part.substring(comma + 1))
      }
    Rule(conds, if (labelStr.isEmpty) None else Some(labelStr))
  }
}
