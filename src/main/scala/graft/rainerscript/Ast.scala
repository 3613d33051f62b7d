package graft.rainerscript

/** RainerScript AST — the logical IR our front-end builds from config
  * text, mirroring the reference's cnfstmt/cnfexpr tree
  * (grammar/rainerscript.h:112-124, grammar/grammar.y:131-236) before
  * compilation to Spark Column/DataFrame plans.
  */
sealed trait RExpr
case class RStr(s: String) extends RExpr
case class RNum(n: Long) extends RExpr
case class RArr(items: Seq[String]) extends RExpr
/** $msg / $hostname (core), $!a!b (CEE tree), $.a (local), $/g (global) */
case class RVar(raw: String) extends RExpr
case class RFunc(name: String, args: Seq[RExpr]) extends RExpr
case class RBinop(op: String, l: RExpr, r: RExpr) extends RExpr
case class RNot(e: RExpr) extends RExpr
case class RNeg(e: RExpr) extends RExpr

sealed trait RStmt
case class RSet(target: RVar, value: RExpr) extends RStmt
case class RUnset(target: RVar) extends RStmt
case class RIf(cond: RExpr, thenB: Seq[RStmt], elseB: Seq[RStmt]) extends RStmt
/** legacy PRI selector filter: "mail.info" / "*.err" { block } */
case class RPriFilt(selector: String, body: Seq[RStmt]) extends RStmt
/** legacy property filter: :msg, contains, "x" { block } */
case class RPropFilt(prop: String, op: String, negated: Boolean,
                     value: String, body: Seq[RStmt]) extends RStmt
/** foreach ($.x in expr) do { body } — iterate a JSON array, body sees
  * the loop var (grammar/grammar.y foreach, runtime/ruleset.c:310-401) */
case class RForeach(loopVar: RVar, source: RExpr, body: Seq[RStmt]) extends RStmt
case object RStop extends RStmt
/** bare `continue` — a user-requested NOP (grammar.y S_NOP; the
  * reference's optimizer must keep it silent under strict validation,
  * tests/abort-uncleancfg-continue-nop.sh). */
case object RContinue extends RStmt
case class RCall(ruleset: String) extends RStmt
/** call_indirect expr; — dynamic ruleset dispatch by computed name
  * (runtime/ruleset.c:236-275; unknown name = NOP). */
case class RCallIndirect(expr: RExpr) extends RStmt
/** reload_lookup_table(name[, stub]); — hot reload procedure
  * (runtime/lookup.c:975-1011). Set-engine: tables rebuild per epoch, so
  * the statement is a parsed no-op marker. */
case class RReloadLookupTable(table: String, stub: Option[String]) extends RStmt
case class RAction(params: Map[String, String]) extends RStmt
