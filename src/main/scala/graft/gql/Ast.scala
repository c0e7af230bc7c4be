package graft.gql

/** Constraint-tree IR — the Spark engine's rendition of
  * `graphd_constraint` (graphd/graphd.h:1131-1413) built by the parser
  * callbacks (graphd/graphd-ast.c). One constraint = one set of
  * conjunct intrinsic predicates + nested subconstraints related
  * through a linkage (doc/a-brief-tour-of-graphd.md:149-183).
  */

/** How a subconstraint connects to its parent
  * (graphd/graphd.h:1197-1211). `ChildPointsToParent(L)` is written
  * `(<-L ...)` — the child is a link whose L endpoint is the parent;
  * `ParentPointsToChild(L)` is written `L->(...)` — the parent's L
  * endpoint is the child.
  */
sealed trait Linkage { def field: String }
final case class ChildPointsToParent(field: String) extends Linkage
final case class ParentPointsToChild(field: String) extends Linkage

object Linkage {
  val fields = Set("left", "right", "typeguid", "scope")
}

/** node / link-direction meta constraint (libgdp/gdp-parse.c:1980,2013). */
sealed trait Meta
case object AnyMeta extends Meta
case object NodeOnly extends Meta   // left and right both null
case object ForwardLink extends Meta // `->`: has left
case object BackwardLink extends Meta // `<-`

/** Tri-state flags: live=/archival= (libgdp/gdp-parse.c:1228-1233). */
sealed trait Tristate
case object MustBeTrue extends Tristate
case object MustBeFalse extends Tristate
case object DontCare extends Tristate

/** One comparison on the value/name under a comparator
  * (libgdp/gdp-parse.c:1624-1668).
  */
sealed trait StrOp
case object OpEq extends StrOp
case object OpNe extends StrOp
case object OpLt extends StrOp
case object OpLe extends StrOp
case object OpGt extends StrOp
case object OpGe extends StrOp
case object OpMatch extends StrOp // ~= word/glob match

final case class StrPred(op: StrOp, values: Seq[Option[String]])

/** GUID / linkage-field predicate: equality or exclusion against a set
  * of serials, possibly null (graphd/graphd-guid-constraint.c,
  * graphd/graphd.h:487-514). `lineage=true` means `~=` semantics (any
  * version of the lineage).
  */
final case class GuidPred(include: Boolean, serials: Seq[Option[Long]],
    lineage: Boolean = false)

/** count=/atleast=/optional bounds (graphd/graphd.h:474-485). */
final case class CountBounds(min: Long = 1L, max: Option[Long] = None)

/** Result pattern (graphd/graphd.h:567-677, libgdp/gdp-parse.c:258-313). */
sealed trait Pattern
final case class FieldPat(name: String) extends Pattern // guid value name ...
/** `literal=x` renders as a bare ATOM (graphd-pattern.c:400-412,
  * graphd_value_atom_set_constant); a quoted string in pattern position
  * stays a string value. `atom` records which form was written.
  */
final case class LiteralPat(s: String, atom: Boolean = false) extends Pattern
case object ContentsPat extends Pattern
case object CountPat extends Pattern
case object CursorPat extends Pattern
case object EstimateCountPat extends Pattern
/** set-level iterator dump (graphd-iterator-dump.c): the frozen
  * iterator's type and statistics as nested lists
  */
case object IteratorPat extends Pattern
/** set-level cost estimate (graphd-read-set-estimate.c:28):
  * ("string" is-sorted check-cost next-cost n)
  */
case object EstimatePat extends Pattern
case object NonePat extends Pattern
final case class VarPat(name: String) extends Pattern
final case class ListPat(items: Seq[Pattern]) extends Pattern
final case class PickPat(items: Seq[Pattern]) extends Pattern

object FieldPat {
  val fields = Set("guid", "name", "type", "typeguid", "value", "valuetype",
    "datatype", "timestamp", "left", "right", "scope", "live", "archival",
    "meta", "generation", "previous", "next")
}

final case class SortKey(pat: Pattern, ascending: Boolean,
    /** per-key comparator override: `sort-comparator=(...)`
      * (libgdp/gdp-parse.c:2047); None = constraint's comparator
      */
    comparator: Option[String] = None)

final case class Assignment(variable: String, pat: Pattern)

/** One parenthesized constraint with its conjuncts and children. */
final case class Constraint(
    linkage: Option[Linkage] = None,
    meta: Meta = AnyMeta,
    guid: Seq[GuidPred] = Nil,
    // version-chain predicates (guid2: previous=/next= with =/!=/~=;
    // null forms allowed — previous=null means "has no predecessor")
    previous: Seq[GuidPred] = Nil,
    next: Seq[GuidPred] = Nil,
    // linkage-field predicates by field name (left/right/typeguid/scope)
    linkFields: Map[String, Seq[GuidPred]] = Map.empty,
    typeNames: Option[Seq[String]] = None, // type="t" (resolved to typeguids)
    /** read-side type predicates: each `type=(...)` is one pred, preds
      * INTERSECT, and a null entry matches the typeless primitive
      * (group.sh "7xnull", guidlist3). `typeNames` stays the flattened
      * union for the write path and type minting.
      */
    typePreds: Seq[Seq[Option[String]]] = Nil,
    name: Seq[StrPred] = Nil,
    value: Seq[StrPred] = Nil,
    datatype: Option[Byte] = None,
    live: Tristate = MustBeTrue,
    archival: Tristate = DontCare,
    timestampMin: Option[(Long, Boolean)] = None, // (micros, inclusive)
    timestampMax: Option[(Long, Boolean)] = None,
    newestMin: Option[Long] = Some(0L), // default newest=0
    newestMax: Option[Long] = Some(0L),
    /** true once an explicit newest op replaced the default window —
      * later newest ops INTERSECT instead of re-widening the other side
      */
    newestTouched: Boolean = false,
    oldestEq: Option[Long] = None, // oldest=N: generation counted from old end
    asof: Option[Long] = None, // request modifier: snapshot id horizon
    asofTs: Option[Long] = None, // asof=<timestamp>: written at/before (micros)
    datelineMin: Option[Long] = None, // dateline > "tok": only primitives after
    datelineMax: Option[Long] = None, // dateline < "tok": only primitives before
    timeoutMillis: Option[Long] = None, // timeout=<seconds> request modifier
    costLimit: Option[String] = None, // cost="tu=N ...": budget + report request
    cursorTok: Option[String] = None, // cursor="..." resume token
    // write-side upsert markers (doc/gr-protocol.txt:661-857)
    uniqueFields: Option[Seq[String]] = None, // unique=(fields)
    keyFields: Option[Seq[String]] = None,    // key=(fields)
    anchorFlag: Boolean = false,              // anchor
    anchorLocal: Boolean = false, // anchor=local: this primitive only (anchor3)
    comparator: String = "default",
    /** value-comparator= override for VALUE comparisons and value
      * sorts (david_8: value-comparator="default" comparator="octet")
      */
    valueComparator: Option[String] = None,
    count: CountBounds = CountBounds(),
    optional: Boolean = false,
    isFalse: Boolean = false,
    // parse-time bookkeeping: flags assigned so far (duplicate
    // assignment is an error — random6, yesno)
    setFlags: Set[String] = Set.empty,
    result: Option[Pattern] = None,
    sort: Seq[SortKey] = Nil,
    /** positional sort-key comparator overrides; merged into `sort`
      * when the constraint completes (order-independent with sort=)
      */
    sortComparators: Seq[String] = Nil,
    pagesize: Option[Long] = None,
    start: Option[Long] = None,
    countlimit: Option[Long] = None,
    assignments: Seq[Assignment] = Nil,
    subs: Seq[Constraint] = Nil,
    /** `A || B` alternatives (graphd/graphd-constraint-or.c,
      * libgdp/gdp-parse.c:2093-2131): when non-empty, this constraint's
      * own conjuncts are the first branch and these are the rest; the
      * set is the deduplicated union of all branches.
      */
    orBranches: Seq[Constraint] = Nil) {

  def effectiveCount: CountBounds =
    if (optional) count.copy(min = 0L) else count

  /** linkage, defaulting from bare `->` / `<-` direction markers: a
    * `(-> ...)` child is a link whose left is the parent, `(<- ...)`
    * one whose right is the parent (doc/a-brief-tour-of-graphd.md:149).
    */
  def effectiveLinkage: Option[Linkage] = linkage.orElse(meta match {
    case ForwardLink => Some(ChildPointsToParent("left"))
    case BackwardLink => Some(ChildPointsToParent("right"))
    case _ => None
  })
}
