package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Restricted-FHIRPath evaluator — the one genuinely novel scalar expression
  * the reference needs (IRIS `GetFHIRPath` / `GetFHIRPathOne`, see
  * notebooks/RaceAndEthnicCategorySQL.ipynb:44-48,71-73,453-455,643-648 and
  * notebooks/DiabetesSQL.ipynb:1119-1123 in the reference repo).
  *
  * Grammar (frozen to the path shapes the reference actually uses — anything
  * else throws loudly, per SURVEY.md §7.4 risk 2):
  * {{{
  *   path    := segment ('.' segment)*
  *   segment := name                      // member access (flat-maps arrays)
  *            | name '[' int ']'          // 0-based index into an array member
  *            | "extension('url')"        // filter extension[] on url
  * }}}
  *
  * FHIRPath collection semantics: every step maps over the current node
  * collection; a member access on an array element flat-maps. `one = false`
  * returns all matches as a JSON array string (GetFHIRPath); `one = true`
  * returns the first match as a scalar string — string nodes unquoted,
  * non-string nodes as compact JSON (GetFHIRPathOne). Empty result → null.
  *
  * Implemented as a Catalyst `BinaryExpression` (CodegenFallback): the parsed
  * path is cached per-literal, the Jackson parse dominates cost, and the
  * expression stays inside the row pipeline (no UDF serialization boundary).
  */
case class FhirPathExpr(left: Expression, right: Expression, one: Boolean)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String =
    if (one) "get_fhirpath_one" else "get_fhirpath"

  /** Generated code calls back into [[nullSafeEval]] through a captured
    * reference — unlike CodegenFallback this keeps the expression inside
    * the surrounding WholeStageCodegen stage (no interpreted-row boundary
    * around the rest of the projection).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("fhirPathExpr", this,
      classOf[FhirPathExpr].getName)
    val result = ctx.freshName("fhirPathResult")
    nullSafeCodeGen(ctx, ev, (json, path) => {
      s"""
         |Object $result = $refName.evalJson($json, $path);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (UTF8String) $result;
         |}
       """.stripMargin
    })
  }

  /** Public entry for generated code. */
  def evalJson(json: Any, path: Any): Any = nullSafeEval(json, path)

  @transient private lazy val mapper = new ObjectMapper()
  // Path is a literal in every reference query; cache the last parsed form.
  @transient private var cachedPathStr: String = _
  @transient private var cachedPath: Array[FhirPathExpr.Seg] = _

  override protected def nullSafeEval(json: Any, path: Any): Any = {
    val pathStr = path.toString
    if (cachedPath == null || cachedPathStr != pathStr) {
      cachedPath = FhirPathExpr.parsePath(pathStr)
      cachedPathStr = pathStr
    }
    val root = FhirPathExpr.parseMemo(mapper, json.toString)
    if (root == null) return null

    var current: List[JsonNode] = List(root)
    cachedPath.foreach { seg => current = FhirPathExpr.step(current, seg) }

    if (one) {
      current.headOption match {
        case None => null
        case Some(n) if n.isTextual => UTF8String.fromString(n.asText())
        case Some(n) => UTF8String.fromString(n.toString)
      }
    } else {
      if (current.isEmpty) null
      else {
        val arr = mapper.createArrayNode()
        current.foreach(arr.add)
        UTF8String.fromString(arr.toString)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FhirPathExpr {

  /** Last-document parse memo, one slot per task thread: a projection that
    * extracts k paths from the same JSON column holds k expression
    * INSTANCES, each of which would re-parse the identical document for
    * its row (q26 3×, q47 5×, the reference's race/ethnicity extract
    * likewise). All instances evaluate row-by-row inside the same stage,
    * so memoizing the single last (string, tree) pair turns k parses into
    * one parse + (k-1) string compares. Keyed by the immutable String copy
    * — NOT the incoming UTF8String, which is a view into a reused row
    * buffer and cannot be held across rows. A failed parse memoizes null
    * so malformed docs aren't re-parsed k times either. The slot is a
    * SoftReference: executor task threads are long-lived, and a hard
    * reference would pin the last multi-MB document + parsed tree per
    * thread for the executor's lifetime even with no FHIRPath query
    * running.
    */
  private val lastDoc =
    new ThreadLocal[java.lang.ref.SoftReference[(String, JsonNode)]]()

  private[functions] def parseMemo(mapper: ObjectMapper,
      json: String): JsonNode = {
    val ref = lastDoc.get()
    val memo = if (ref == null) null else ref.get()
    if (memo != null && memo._1 == json) memo._2
    else {
      val tree =
        try mapper.readTree(json)
        catch { case _: Exception => null }
      lastDoc.set(new java.lang.ref.SoftReference((json, tree)))
      tree
    }
  }

  sealed trait Seg
  final case class Member(name: String) extends Seg
  final case class Indexed(name: String, idx: Int) extends Seg
  final case class ExtensionFilter(url: String) extends Seg

  private val MemberRe = "^([A-Za-z_][A-Za-z0-9_]*)$".r
  private val IndexedRe = "^([A-Za-z_][A-Za-z0-9_]*)\\[(\\d+)\\]$".r
  private val ExtRe = "^extension\\('([^']+)'\\)$".r

  /** Split on '.' outside quotes, then classify each segment. */
  def parsePath(path: String): Array[Seg] = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var inQuote = false
    path.foreach {
      case '\'' => inQuote = !inQuote; sb += '\''
      case '.' if !inQuote => segs += sb.result(); sb.clear()
      case c => sb += c
    }
    segs += sb.result()
    segs.map {
      case ExtRe(url) => ExtensionFilter(url)
      case IndexedRe(name, i) => Indexed(name, i.toInt)
      case MemberRe(name) => Member(name)
      case other => throw new IllegalArgumentException(
        s"get_fhirpath: unsupported path segment '$other' in '$path' " +
          "(supported: member, member[idx], extension('url'))")
    }.toArray
  }

  private def children(n: JsonNode, name: String): List[JsonNode] = {
    val v = n.get(name)
    if (v == null || v.isNull) Nil
    else if (v.isArray) {
      val it = v.elements()
      val buf = scala.collection.mutable.ListBuffer.empty[JsonNode]
      while (it.hasNext) buf += it.next()
      buf.toList
    } else List(v)
  }

  def step(nodes: List[JsonNode], seg: Seg): List[JsonNode] = seg match {
    case Member(name) => nodes.flatMap(children(_, name))
    case Indexed(name, idx) =>
      nodes.flatMap { n =>
        val kids = children(n, name)
        if (idx < kids.length) List(kids(idx)) else Nil
      }
    case ExtensionFilter(url) =>
      nodes.flatMap(children(_, "extension")).filter { e =>
        val u = e.get("url"); u != null && u.isTextual && u.asText() == url
      }
  }
}
