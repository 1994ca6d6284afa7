package graft.plans

import org.apache.spark.sql.Row

/** Row-pattern AST, parser, and leftmost-greedy backtracking matcher — the
  * core of MATCH_RECOGNIZE (SURVEY.md §2.5).
  *
  * The reference compiles row patterns to an NFA program executed per
  * partition (reference: core/trino-main/src/main/java/io/trino/operator/window/
  * matcher/Matcher.java:28, IrRowPatternToProgramRewriter.java; grammar
  * core/trino-grammar/src/main/antlr4/io/trino/grammar/sql/SqlBase.g4
  * patternRecognition rule at :446). This is a direct CPS backtracking matcher
  * over the same algebra — concatenation, alternation (preferring the left
  * branch), and greedy `?`, `*`, `+` quantifiers — which reproduces the standard
  * leftmost-greedy preferment order without materializing thread states.
  * Partitions are bounded (they fit an executor's work unit) so backtracking
  * depth is bounded too; symbols always consume a row, and empty quantifier
  * repetitions are rejected, so matching terminates.
  */
object RowPattern {

  sealed trait Pat
  final case class Sym(name: String) extends Pat
  final case class Cat(ps: List[Pat]) extends Pat
  final case class Alt(l: Pat, r: Pat) extends Pat
  final case class Opt(p: Pat) extends Pat
  final case class Star(p: Pat) extends Pat
  final case class Plus(p: Pat) extends Pat
  /** General quantifier (reference SqlBase.g4:921 patternQuantifier): the
    * bounded forms `{n}`, `{n,}`, `{,m}`, `{n,m}` and every RELUCTANT form
    * (`*?`, `+?`, `??`, `{…}?`). Greedy prefers MORE repetitions,
    * reluctant prefers FEWER — the standard regex preferment, decided by
    * the backtracking order. The plain greedy `*`/`+`/`?` keep their
    * dedicated nodes above. */
  final case class Quant(p: Pat, min: Int, max: Option[Int],
      greedy: Boolean) extends Pat
  /** `()` — the empty pattern (SqlBase.g4 patternPrimary emptyPattern):
    * matches zero rows, the doc's canonical empty-match producer. */
  case object Empty extends Pat
  /** `^` — matches (zero-width) only at the partition start
    * (SqlBase.g4 partitionStartAnchor). Forbidden in window specs. */
  case object StartAnchor extends Pat
  /** `$` — matches (zero-width) only at the partition end. */
  case object EndAnchor extends Pat
  /** Exclusion `{- p -}`: rows match and consume normally but are omitted
    * from ALL ROWS PER MATCH output (reference grammar SqlBase.g4
    * patternPrimary exclusion; semantics sql/analyzer — exclusions affect
    * only the per-row output, never measures or navigation). */
  final case class Excl(p: Pat) extends Pat

  /** Parse `"A (B | C)+ D* E{2,4}?"` into the AST. */
  def parse(s: String): Pat = new Parser(s).parseAll()

  /** Does the pattern contain a partition anchor (`^`/`$`)? The reference
    * forbids anchors in window specifications
    * (pattern-recognition-in-window.md). */
  def containsAnchor(p: Pat): Boolean = p match {
    case StartAnchor | EndAnchor => true
    case Cat(ps) => ps.exists(containsAnchor)
    case Alt(l, r) => containsAnchor(l) || containsAnchor(r)
    case Opt(s) => containsAnchor(s)
    case Star(s) => containsAnchor(s)
    case Plus(s) => containsAnchor(s)
    case Quant(s, _, _, _) => containsAnchor(s)
    case Excl(s) => containsAnchor(s)
    case _ => false
  }

  /** Does the pattern contain an exclusion `{- … -}`? The reference forbids
    * exclusions with ALL ROWS PER MATCH WITH UNMATCHED ROWS
    * (match-recognize.md "Row pattern syntax": exclusion syntax is not
    * allowed when unmatched rows are reported). */
  def containsExclusion(p: Pat): Boolean = p match {
    case Excl(_) => true
    case Cat(ps) => ps.exists(containsExclusion)
    case Alt(l, r) => containsExclusion(l) || containsExclusion(r)
    case Opt(s) => containsExclusion(s)
    case Star(s) => containsExclusion(s)
    case Plus(s) => containsExclusion(s)
    case Quant(s, _, _, _) => containsExclusion(s)
    case _ => false
  }

  private final class Parser(input: String) {
    private var pos = 0
    private def skipWs(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Option[Char] = { skipWs(); if (pos < input.length) Some(input(pos)) else None }

    def parseAll(): Pat = {
      val p = alt()
      skipWs()
      require(pos == input.length, s"trailing input at $pos in pattern '$input'")
      p
    }
    private def alt(): Pat = {
      var l = cat()
      while (peek.contains('|')) { pos += 1; l = Alt(l, cat()) }
      l
    }
    private def cat(): Pat = {
      val ps = scala.collection.mutable.ListBuffer[Pat]()
      var continue = true
      while (continue) peek match {
        case Some(c) if c.isLetter || c == '(' || c == '^' || c == '$' => ps += rep()
        case Some('{') if input.startsWith("{-", pos) => ps += rep()
        case _ => continue = false
      }
      require(ps.nonEmpty, s"empty pattern element at $pos in '$input'")
      if (ps.size == 1) ps.head else Cat(ps.toList)
    }
    /** Trailing `?` turns any quantifier reluctant (prefer FEWER reps). */
    private def reluctant(): Boolean =
      if (peek.contains('?')) { pos += 1; true } else false
    private def rep(): Pat = {
      val a = atom()
      peek match {
        case Some('*') =>
          pos += 1
          if (reluctant()) Quant(a, 0, None, greedy = false) else Star(a)
        case Some('+') =>
          pos += 1
          if (reluctant()) Quant(a, 1, None, greedy = false) else Plus(a)
        case Some('?') =>
          pos += 1
          if (reluctant()) Quant(a, 0, Some(1), greedy = false) else Opt(a)
        case Some('{') if !input.startsWith("{-", pos) =>
          pos += 1
          def int(): Option[Int] = {
            skipWs()
            val start = pos
            while (pos < input.length && input(pos).isDigit) pos += 1
            if (pos == start) None else Some(input.substring(start, pos).toInt)
          }
          val lo = int()
          skipWs()
          val (min, max) =
            if (peek.contains(',')) {
              pos += 1
              val hi = int()
              (lo.getOrElse(0), hi)
            } else {
              val n = lo.getOrElse(throw new IllegalArgumentException(
                s"quantifier needs a bound at $pos in '$input'"))
              (n, Some(n))
            }
          require(peek.contains('}'), s"missing '}' at $pos in '$input'")
          pos += 1
          max.foreach(m => require(min <= m,
            s"quantifier {$min,$m} has min > max in '$input'"))
          Quant(a, min, max, greedy = !reluctant())
        case _ => a
      }
    }
    private def atom(): Pat = peek match {
      case Some('^') => pos += 1; StartAnchor
      case Some('$') => pos += 1; EndAnchor
      case Some('{') if input.startsWith("{-", pos) =>
        pos += 2
        val p = alt()
        skipWs()
        require(input.startsWith("-}", pos), s"missing '-}' at $pos in '$input'")
        pos += 2
        Excl(p)
      case Some('(') =>
        pos += 1
        if (peek.contains(')')) { pos += 1; Empty } // '()' empty pattern
        else {
          val p = alt()
          require(peek.contains(')'), s"missing ')' at $pos in '$input'")
          pos += 1
          p
        }
      case Some(c) if c.isLetter =>
        val start = pos
        while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
        val name = input.substring(start, pos)
        if (name.equalsIgnoreCase("PERMUTE") && peek.contains('(')) permute()
        else Sym(name)
      case other => throw new IllegalArgumentException(s"unexpected '$other' at $pos in '$input'")
    }

    /** PERMUTE(p1, …, pn) ≡ alternation of every ordering of its arguments,
      * preferred lexicographically by argument position — matching the
      * reference's expansion (grammar SqlBase.g4 patternPrimary PERMUTE;
      * semantics sql/analyzer/PatternRecognitionAnalyzer). Left-preferring
      * Alt over permutations in lexicographic order reproduces the standard
      * preferment. */
    private def permute(): Pat = {
      pos += 1 // consume '('
      val args = scala.collection.mutable.ListBuffer[Pat](alt())
      while (peek.contains(',')) { pos += 1; args += alt() }
      require(peek.contains(')'), s"missing ')' after PERMUTE args at $pos in '$input'")
      pos += 1
      val perms = args.toList.permutations.toList // lexicographic for distinct positions
      perms.map(ps => if (ps.size == 1) ps.head else Cat(ps))
        .reduceRight[Pat]((l, r) => Alt(l, r))
    }
  }

  /** One match: [start, end) row span plus the (symbol, rowIndex) trace in
    * row order — the CLASSIFIER() sequence. `excluded` holds row indices
    * matched inside `{- … -}` exclusions: they consume and participate in
    * measures/navigation like any matched row but are omitted from
    * ALL ROWS PER MATCH output (reference exclusion semantics). */
  final case class PatternMatch(start: Int, end: Int, steps: IndexedSeq[(String, Int)],
      excluded: Set[Int] = Set.empty) {
    def indicesOf(sym: String): IndexedSeq[Int] = steps.collect { case (`sym`, i) => i }
    def firstIdx(sym: String): Int = indicesOf(sym).head
    def lastIdx(sym: String): Int = indicesOf(sym).last
    def countOf(sym: String): Long = steps.count(_._1 == sym).toLong
    /** The trace without exclusion-matched rows — the per-row output set. */
    def visibleSteps: IndexedSeq[(String, Int)] = steps.filterNot(s => excluded(s._2))
  }

  /** Symbol predicate: sees the whole ordered partition + the candidate row
    * index, so DEFINE clauses can reference PREV/NEXT like the reference's
    * navigation functions. */
  type Predicate = (IndexedSeq[Row], Int) => Boolean

  /** Partial-match trace as seen by a state-aware predicate: (symbol,
    * rowIndex) steps of the match so far, MOST RECENT FIRST. The candidate
    * row itself is not yet in the trace. */
  type Trace = List[(String, Int)]

  /** Match-state-aware predicate — the reference's full DEFINE semantics
    * (conditions over LAST(A.x), COUNT(B.*), etc. need the rows already
    * mapped in the current partial match; reference
    * operator/window/matcher/Matcher.java evaluates labels against the
    * partial ArrayView of previous labels). */
  type TracePredicate = (IndexedSeq[Row], Int, Trace) => Boolean

  /** Lift a state-independent predicate. */
  def lift(p: Predicate): TracePredicate = (part, i, _) => p(part, i)

  /** Lift a whole DEFINE map of state-independent predicates. */
  def liftAll(m: Map[String, Predicate]): Map[String, TracePredicate] =
    m.map { case (k, v) => k -> lift(v) }

  final class Matcher(pattern: Pat, define: Map[String, TracePredicate])
      extends Serializable {

    // trace entries: (symbol, rowIndex, insideExclusion)
    private type Acc = List[(String, Int, Boolean)]

    /** Leftmost-greedy anchored match at `pos`; returns (endPos, reversed steps). */
    private def matchAt(part: IndexedSeq[Row], p: Pat, pos: Int,
        acc: Acc, excl: Boolean,
        k: (Int, Acc) => Option[(Int, Acc)]): Option[(Int, Acc)] =
      p match {
        case Sym(s) =>
          val pred = define.getOrElse(s,
            (_: IndexedSeq[Row], _: Int, _: Trace) => true)
          if (pos < part.length &&
            pred(part, pos, acc.map(t => (t._1, t._2))))
            k(pos + 1, (s, pos, excl) :: acc)
          else None
        case Cat(ps) =>
          ps.foldRight(k) { (sub, kk) =>
            (pp: Int, aa: Acc) => matchAt(part, sub, pp, aa, excl, kk)
          }(pos, acc)
        case Alt(l, r) =>
          matchAt(part, l, pos, acc, excl, k).orElse(matchAt(part, r, pos, acc, excl, k))
        case Opt(sub) =>
          matchAt(part, sub, pos, acc, excl, k).orElse(k(pos, acc))
        case Star(sub) =>
          def loop(pp: Int, aa: Acc): Option[(Int, Acc)] =
            matchAt(part, sub, pp, aa, excl,
              (p2, a2) => if (p2 == pp) None else loop(p2, a2)).orElse(k(pp, aa))
          loop(pos, acc)
        case Plus(sub) =>
          matchAt(part, sub, pos, acc, excl, (p2, a2) => {
            def loop(pp: Int, aa: Acc): Option[(Int, Acc)] =
              matchAt(part, sub, pp, aa, excl,
                (p3, a3) => if (p3 == pp) None else loop(p3, a3)).orElse(k(pp, aa))
            loop(p2, a2)
          })
        case Quant(sub, min, max, greedy) =>
          // general {min,max} with greedy/reluctant preferment. A body
          // iteration that consumes no rows would repeat identically forever,
          // but it also satisfies ANY remaining repetition count (a zero-width
          // derivation adds no rows and no trace entries, so repeating it to
          // reach min changes nothing) — so a zero-width iteration COMPLETES
          // the quantifier in place instead of being cut. This makes `(){n}`
          // and `(A | ()){1,2}` produce empty matches exactly as the
          // reference's grammar composes the empty pattern with every
          // quantifier (SqlBase.g4 patternPrimary `()` × patternQuantifier;
          // match-recognize.md empty-match rules), while still terminating.
          def go(cnt: Int, pp: Int, aa: Acc): Option[(Int, Acc)] = {
            def more =
              if (max.forall(cnt < _))
                matchAt(part, sub, pp, aa, excl,
                  (p2, a2) => if (p2 == pp) k(p2, a2) else go(cnt + 1, p2, a2))
              else None
            def stop = if (cnt >= min) k(pp, aa) else None
            if (greedy) more.orElse(stop) else stop.orElse(more)
          }
          go(0, pos, acc)
        case Empty => k(pos, acc)
        case StartAnchor => if (pos == 0) k(pos, acc) else None
        case EndAnchor => if (pos == part.length) k(pos, acc) else None
        case Excl(sub) =>
          matchAt(part, sub, pos, acc, excl = true, k)
      }

    /** Anchored match attempt AT `pos` (the row-pattern-in-window-spec
      * contract, SqlBase.g4:876-880 windowSpecification → patternRecognition:
      * each row of the partition anchors its own match attempt — INITIAL
      * semantics). Empty matches are discarded. */
    def anchoredAt(part: IndexedSeq[Row], pos: Int): Option[PatternMatch] =
      anchoredAtAllowEmpty(part, pos).filter(m => m.end > m.start)

    /** As `anchoredAt`, but an EMPTY match (pattern succeeds assigning no
      * variables) returns PatternMatch(pos, pos, empty) instead of None —
      * the window processing model treats it as a successful match whose
      * measures evaluate over an empty row sequence
      * (pattern-recognition-in-window.md "Empty matches and unmatched
      * rows"). */
    def anchoredAtAllowEmpty(part: IndexedSeq[Row], pos: Int): Option[PatternMatch] =
      matchAt(part, pattern, pos, Nil, excl = false, (e, a) => Some((e, a))) match {
        case Some((end, acc)) =>
          val trace = acc.reverse.toIndexedSeq
          Some(PatternMatch(pos, end, trace.map(t => (t._1, t._2)),
            trace.collect { case (_, i, true) => i }.toSet))
        case _ => None
      }

    /** All NON-EMPTY matches over the ordered partition. `skipPastLastRow` =
      * the reference's AFTER MATCH SKIP PAST LAST ROW (default); false = SKIP
      * TO NEXT ROW (overlapping matches allowed). Empty matches are discarded,
      * the legacy contract for callers that number matches over this list. */
    def findAll(part: IndexedSeq[Row], skipPastLastRow: Boolean = true): Seq[PatternMatch] =
      findAll(part, if (skipPastLastRow) SkipPastLastRow else SkipToNextRow)

    /** Full AFTER MATCH skip-mode surface, including SKIP TO [FIRST|LAST]
      * <variable> (reference SqlBase.g4 skipTo :462; runtime semantics
      * operator/window/PatternRecognitionPartition resume logic): resume AT
      * the first/last row the variable (or any member of a SUBSET union)
      * mapped in the match. Resuming at the match's own first row would
      * loop forever — the reference raises, and so do we; a variable that
      * mapped no rows raises too. Non-empty matches only (legacy contract). */
    def findAll(part: IndexedSeq[Row], skip: SkipMode): Seq[PatternMatch] =
      scanAll(part, skip).filter(m => m.end > m.start)

    /** All matches INCLUDING empty ones (start == end, no steps) — the
      * reference's full match stream (docs/src/main/sphinx/sql/
      * match-recognize.md "Evaluating expressions in empty matches and
      * unmatched rows"): an empty match occurs when the pattern matches with
      * zero pattern variables assigned; it has a starting row and consumes a
      * sequential match number like any other match. The AFTER MATCH SKIP
      * clause applies only to NON-empty matches — after an empty match the
      * scan always resumes at the next row ("Skipping to the next row is the
      * default behavior after detecting an empty match or unmatched row"),
      * and SKIP TO <var> cannot fail on an empty match. */
    def scanAll(part: IndexedSeq[Row], skip: SkipMode): Seq[PatternMatch] = {
      val out = scala.collection.mutable.ArrayBuffer[PatternMatch]()
      var pos = 0
      while (pos < part.length) {
        matchAt(part, pattern, pos, Nil, excl = false, (e, a) => Some((e, a))) match {
          case Some((end, acc)) if end > pos =>
            val trace = acc.reverse.toIndexedSeq
            out += PatternMatch(pos, end, trace.map(t => (t._1, t._2)),
              trace.collect { case (_, i, true) => i }.toSet)
            pos = skip match {
              case SkipPastLastRow => end
              case SkipToNextRow => pos + 1
              case SkipToVar(vars, first, label) =>
                val hits = trace.collect { case (v, i, _) if vars(v) => i }
                if (hits.isEmpty) throw new IllegalArgumentException(
                  s"AFTER MATCH SKIP TO $label: variable mapped no rows in the match")
                val target = if (first) hits.min else hits.max
                if (target <= pos) throw new IllegalArgumentException(
                  s"AFTER MATCH SKIP TO $label: cannot resume at the first row of the match")
                target
            }
          case Some((end, _)) => // empty match at pos (end == pos)
            out += PatternMatch(pos, end, IndexedSeq.empty)
            pos += 1
          case None =>
            pos += 1
        }
      }
      out.toSeq
    }
  }

  /** AFTER MATCH skip modes (reference SqlBase.g4 skipTo :462). */
  sealed trait SkipMode
  case object SkipPastLastRow extends SkipMode
  case object SkipToNextRow extends SkipMode
  /** `vars` is the variable's expansion (itself, or its SUBSET members);
    * `first` selects FIRST vs LAST; `label` is for error messages. */
  final case class SkipToVar(vars: Set[String], first: Boolean,
      label: String) extends SkipMode
}
