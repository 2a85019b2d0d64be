"""Basic-graph-pattern (BGP) matching over the triple table.

The reference emits RDF for downstream SPARQL engines; this module is
the Spark-native equivalent of the SPARQL BGP core: a conjunctive set of
triple patterns compiles to filtered scans of the triple table joined on
shared variables — i.e. straight into Catalyst's join planner, which is
exactly where this work belongs.

Pattern syntax: a pattern is (s, p, o); a term starting with ``?`` is a
variable, anything else is a constant matched against the IRI/literal
text. ``match_bgp`` returns one column per variable.

Scale design:

- Each pattern becomes ONE filtered projection of the triple table; the
  constant filters (usually `pred = <iri>`) sit directly on the scan, so
  a parquet/Iceberg triple table partitioned or sorted by `pred` prunes
  to the touched predicate's row groups only.
- Join order follows the written pattern order, joining each new pattern
  on its variables shared with the accumulated result (inner,
  equi-join). AQE picks broadcast vs sort-merge per join at runtime —
  selective patterns (e.g. `rdf:type <rare-class>`) broadcast naturally.
  Writing selective patterns first shrinks every intermediate, same as
  any SPARQL engine's heuristic ordering.
- Patterns sharing no variable with the accumulated result are rejected
  unless ``allow_cartesian=True`` — an accidental cross join over a
  10^10-triple table should be an error, not a plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POSITIONS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


#: bound on ``pred+`` property-path expansion (SPARQL has no bound; a
#: distributed engine needs one — callers override per call via
#: match_bgp(path_max_hops=...))
DEFAULT_PATH_MAX_HOPS = 10


def _compile_path_pattern(triples: DataFrame, pattern: tuple,
                          max_hops: int) -> DataFrame:
    """A pattern whose predicate ends in ``+``, ``*`` or ``?`` (SPARQL
    one-or-more / zero-or-more / zero-or-one property paths): replace the
    triple scan with the bounded transitive closure (``+``/``*``) or the
    plain single-hop edges (``?``) of that predicate's edge list
    (graph.reachability — semi-naive BFS), then bind s/o exactly like a
    plain pattern. Constants filter the CLOSED pair set, so
    ``(<file>, "kg:dep+", ?m)`` is everything reachable from one node.
    ``pred*`` additionally matches the zero-length path: one (x, x) row
    per graph node (distinct subjects ∪ IRI objects over the whole
    triple table — the engine's pragmatic reading of SPARQL's
    unbounded zero-length term set).

    A parenthesized alternation base — ``(p|q)+`` / ``(p|^q)*`` — closes
    the UNION of the member edge sets (≠ the union of the closures,
    which the bare ``p+|q+`` form gives): each member is one
    predicate-filtered scan, ``^`` members contribute their edges
    reversed, and the semi-naive BFS runs once over the merged edge
    list. This is the SPARQL idiom for equivalence reachability
    (``(owl:sameAs|^owl:sameAs)*``)."""
    from .graph import reachability

    s, p, o = pattern
    if isinstance(p, tuple):
        # closure over a sequence group — ("+", s1, s2, …) from (s1/s2)+
        # — closes the COMPOSED edge set (≠ composing the closures):
        # the sequence compiles once into its (src, dst) pair set via
        # fresh endpoint variables, then the same semi-naive BFS runs
        # over those composite edges
        mode = p[0]
        a = f"__cp{next(_SEQ_IDS)}"
        b = f"__cp{next(_SEQ_IDS)}"
        seq = ("/", *p[1:]) if len(p) > 2 else p[1]
        pairs = _compile_pattern(triples, (f"?{a}", seq, f"?{b}"),
                                 max_hops)
        edges = pairs.select(F.col(a).alias("subj"),
                             F.col(b).alias("obj")).distinct()
    elif (p[:-1].startswith("(") and p[:-1].endswith(")")):
        base, mode = p[:-1], p[-1]
        members = [m.strip() for m in base[1:-1].split("|") if m.strip()]
        if not members:
            raise ValueError(f"empty path alternation: {p!r}")
        edges = None
        for m in members:
            inv = m.startswith("^")
            part = triples.filter(
                (F.col("pred") == (m[1:] if inv else m))
                & F.col("obj_is_iri"))
            part = (part.select(F.col("obj").alias("subj"),
                                F.col("subj").alias("obj")) if inv
                    else part.select("subj", "obj"))
            edges = part if edges is None else edges.unionByName(part)
        edges = edges.distinct()
    else:
        base, mode = p[:-1], p[-1]
        edges = (
            triples.filter((F.col("pred") == base) & F.col("obj_is_iri"))
            .select(F.col("subj").alias("subj"), F.col("obj").alias("obj"))
        )
    if mode == "?":
        # zero-or-one: the single-hop edges themselves, no closure
        closed = edges
    else:
        closed = (
            reachability(
                edges.select(F.col("subj").alias("src"),
                             F.col("obj").alias("dst")),
                max_hops=max_hops)
            .select(F.col("src").alias("subj"), F.col("dst").alias("obj"))
        )
    if mode in ("*", "?"):
        nodes = (
            triples.select("subj")
            .unionByName(triples.filter(F.col("obj_is_iri"))
                         .select(F.col("obj").alias("subj")))
            .distinct())
        closed = closed.unionByName(
            nodes.select("subj", F.col("subj").alias("obj"))).distinct()
    df = closed
    var_cols: dict[str, str] = {}
    for pos, term in zip(("subj", "obj"), (s, o)):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in {pattern!r}")
            if name in var_cols:
                df = df.filter(F.col(var_cols[name]) == F.col(pos))
            else:
                var_cols[name] = pos
        else:
            df = df.filter(F.col(pos) == term)
    return df.select(
        *[F.col(pos).alias(name) for name, pos in var_cols.items()])


#: fresh intermediate-variable ids for sequence paths
_SEQ_IDS = __import__("itertools").count()


def _compile_pattern(triples: DataFrame, pattern: tuple,
                     path_max_hops: int = DEFAULT_PATH_MAX_HOPS,
                     meta_vars: frozenset = frozenset()) -> DataFrame:
    """One triple pattern -> filtered projection with variable columns.

    For object-position variables named in *meta_vars* the projection
    additionally binds the term's metadata as ``{var}__isiri`` /
    ``{var}__datatype`` / ``{var}__lang`` — SPARQL's isIRI/isLiteral,
    DATATYPE() and LANG() builtins become plain column references in
    FILTER/BIND expressions. Plain patterns only (path closures carry no
    single term's metadata)."""
    if len(pattern) != 3:
        raise ValueError(f"pattern must be (s, p, o): {pattern!r}")
    pred = pattern[1]
    if isinstance(pred, tuple) and pred and pred[0] in ("+", "*", "?"):
        # closure over a sequence group — (s1/s2)+ — tuple form
        # ("+", s1, s2, …); see _compile_path_pattern
        return _compile_path_pattern(triples, pattern, path_max_hops)
    if isinstance(pred, tuple) and pred and pred[0] == "/":
        # sequence path p1/p2/...: chain through fresh intermediate
        # variables and join consecutive steps on them (tuple form, not
        # string parsing — '/' is ubiquitous inside IRIs). Each step
        # re-dispatches, so ^/+/*/?/| compose inside a sequence.
        steps = list(pred[1:])
        if len(steps) < 2:
            raise ValueError(f"sequence path needs >= 2 steps: {pred!r}")
        terms = ([pattern[0]]
                 + [f"?__seq{next(_SEQ_IDS)}" for _ in steps[:-1]]
                 + [pattern[2]])
        df = None
        for i, step in enumerate(steps):
            part = _compile_pattern(
                triples, (terms[i], step, terms[i + 1]), path_max_hops)
            if df is None:
                df = part
            else:
                on = sorted(set(df.columns) & set(part.columns))
                df = df.join(part, on=on) if on else df.crossJoin(part)
        keep = [c for c in df.columns if not c.startswith("__seq")]
        return df.select(*keep).distinct()
    if isinstance(pred, str) and not _is_var(pred):
        if "|" in pred:
            # top-level alternation splits FIRST — before the ! and ^
            # dispatches — so "!(a)|^!(b)" (the parser's mixed negated
            # set) and "^a|^b" (its ^(a|b) distribution) compile each
            # member, not the whole string
            alts, depth, start = [], 0, 0
            for i, ch in enumerate(pred):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "|" and depth == 0:
                    alts.append(pred[start:i])
                    start = i + 1
            alts.append(pred[start:])
            if len(alts) > 1:
                out = None
                for alt in alts:
                    part = _compile_pattern(
                        triples, (pattern[0], alt, pattern[2]),
                        path_max_hops)
                    out = part if out is None else out.unionByName(part)
                return out.distinct()
        if pred.startswith("!"):
            # negated property set !(p1|p2) / !p (SPARQL 1.1 §9.1
            # PathNegatedPropertySet, forward members only): a single
            # filtered triple scan — NOT IN on the predicate column, so
            # Catalyst pushes it into the scan like any constant filter
            body = pred[1:]
            if body.startswith("(") and body.endswith(")"):
                body = body[1:-1]
            banned = [b.strip() for b in body.split("|") if b.strip()]
            if not banned:
                raise ValueError(f"empty negated property set: {pred!r}")
            if any(b.startswith("^") for b in banned):
                raise ValueError(
                    "inverse members in a negated property set are not "
                    "supported; rewrite with ^ on the whole pattern")
            df = triples.filter(~F.col("pred").isin(banned))
            var_cols: dict[str, str] = {}
            for pos, term in zip(("subj", "obj"),
                                 (pattern[0], pattern[2])):
                if _is_var(term):
                    name = term[1:]
                    if not name:
                        raise ValueError(
                            f"empty variable name in {pattern!r}")
                    if name in var_cols:
                        df = df.filter(F.col(var_cols[name]) == F.col(pos))
                    else:
                        var_cols[name] = pos
                else:
                    df = df.filter(F.col(pos) == term)
            return df.select(
                *[F.col(pos).alias(name)
                  for name, pos in var_cols.items()])
        if pred.startswith("^"):
            # inverse path: swap subject/object and recurse (composes
            # with +/*/! since the remainder re-dispatches)
            return _compile_pattern(
                triples, (pattern[2], pred[1:], pattern[0]), path_max_hops)
        if (pred.endswith(("+", "*", "?")) and pred.startswith("(")
                and pred[-2] == ")"):
            # closure over a parenthesized alternation — (p|^q)+ —
            # closing the union of the edge sets is not the union of
            # the closures
            return _compile_path_pattern(triples, pattern, path_max_hops)
        if (pred.startswith("(") and pred.endswith(")")
                and "|" in pred):
            # a redundantly-wrapped "(a|b)" with no top-level | and no
            # modifier: strip one paren layer and re-dispatch
            return _compile_pattern(
                triples, (pattern[0], pred[1:-1], pattern[2]),
                path_max_hops)
        if pred.endswith(("+", "*", "?")):
            return _compile_path_pattern(triples, pattern, path_max_hops)
    df = triples
    var_cols: dict[str, str] = {}  # var name -> first position holding it
    for pos, term in zip(_POSITIONS, pattern):
        if _is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in {pattern!r}")
            if name in var_cols:  # repeated var inside one pattern
                df = df.filter(F.col(var_cols[name]) == F.col(pos))
            else:
                var_cols[name] = pos
        else:
            df = df.filter(F.col(pos) == term)
    cols = [F.col(pos).alias(name) for name, pos in var_cols.items()]
    for name, pos in var_cols.items():
        if pos == "obj" and name in meta_vars:
            cols += [F.col("obj_is_iri").alias(f"{name}__isiri"),
                     F.col("obj_datatype").alias(f"{name}__datatype"),
                     F.col("obj_lang").alias(f"{name}__lang")]
    return df.select(*cols)


#: selectivity rank of a triple-pattern shape, most selective first —
#: the variable-counting heuristic of Stocker et al. 2008 ("SPARQL
#: basic graph pattern optimization using selectivity estimation",
#: WWW'08): constants bind harder than variables, and a bound subject
#: narrows more than a bound object, which narrows more than a bound
#: predicate alone. Zero statistics needed, so ordering is a pure
#: function of the query — deterministic across engines and data.
_SHAPE_RANK = {
    (True, True, True): 0,   # s p o
    (True, False, True): 1,  # s ? o
    (True, True, False): 2,  # s p ?
    (False, True, True): 3,  # ? p o
    (True, False, False): 4,  # s ? ?
    (False, False, True): 5,  # ? ? o
    (False, True, False): 6,  # ? p ?
    (False, False, False): 7,  # ? ? ?
}


def _pattern_rank(pattern: tuple) -> int:
    def bound(term) -> bool:
        return not (isinstance(term, str) and _is_var(term))

    pred = pattern[1]
    # property paths (closures, alternations, sequences, negated sets)
    # expand beyond one scan: rank them with the predicate unbound, +1
    # so a plain pattern of the same shape always goes first
    is_path = isinstance(pred, tuple) or (
        isinstance(pred, str) and not _is_var(pred)
        and (pred.startswith(("!", "^")) or "|" in pred
             or pred.endswith(("+", "*", "?"))))
    shape = (bound(pattern[0]),
             False if is_path else bound(pred),
             bound(pattern[2]))
    return _SHAPE_RANK[shape] * 2 + (1 if is_path else 0)


def predicate_stats(triples: DataFrame) -> dict:
    """Per-predicate ``{pred: (triples, distinct_subjects,
    distinct_objects)}`` plus a ``None`` row for the whole graph — the
    summary an RDF store keeps for cardinality estimation (RDF-3X's
    aggregated indexes; VoID's property partitions, kg/materialize
    void_stats is the user-facing twin of this).

    One scan + one bounded aggregation: output is |predicates| rows (a
    few hundred on any real vocabulary, never data-sized), so the
    collect is a catalog read, not a data pull. Distinct counts use
    HyperLogLog (approx_count_distinct) — they feed a join-order
    heuristic, where ±2% noise is irrelevant, and the HLL sketch
    merges without a second shuffle."""
    rows = (triples
            .groupBy(F.col("pred"))
            .agg(F.count("*").alias("n"),
                 F.approx_count_distinct("subj").alias("ds"),
                 F.approx_count_distinct("obj").alias("do"))
            .collect())
    stats = {r.pred: (r.n, r.ds, r.do) for r in rows}
    stats[None] = (sum(n for n, _, _ in stats.values()),
                   max((d for _, d, _ in stats.values()), default=1),
                   max((d for _, _, d in stats.values()), default=1))
    return stats


def _pattern_cost(pattern: tuple, stats: dict) -> float:
    """Estimated result cardinality of one triple pattern under
    per-predicate statistics — the standard independence estimator:
    bound subject divides by distinct subjects, bound object by
    distinct objects (RDF-3X / Neumann & Weikum, VLDB'08 §4.2 shape).
    Property paths fall back to whole-graph numbers ×4 (closures touch
    the edge set repeatedly). A bound predicate ABSENT from the stats
    is the cheapest pattern of all: it matches nothing and empties the
    join early."""
    def bound(term) -> bool:
        return not (isinstance(term, str) and _is_var(term))

    pred = pattern[1]
    is_path = isinstance(pred, tuple) or (
        isinstance(pred, str) and not _is_var(pred)
        and (pred.startswith(("!", "^")) or "|" in pred
             or pred.endswith(("+", "*", "?"))))
    if is_path or not bound(pred):
        n, ds, do = stats[None]
        n *= 4 if is_path else 1
    elif pred not in stats:
        return 0.0
    else:
        n, ds, do = stats[pred]
    if bound(pattern[0]) and bound(pattern[2]):
        return 1.0
    if bound(pattern[0]):
        return n / max(ds, 1)
    if bound(pattern[2]):
        return n / max(do, 1)
    return float(n)


def reorder_patterns(patterns: list[tuple],
                     stats: dict | None = None) -> list[tuple]:
    """Greedy selectivity ordering of a BGP: start from the most
    selective pattern, then repeatedly take the most selective pattern
    CONNECTED to the already-chosen set (sharing a variable), falling
    back to the most selective remaining one only when nothing
    connects — the join tree a SPARQL engine's heuristic optimizer
    would build, here feeding Catalyst join order.

    Without *stats*, selectivity is the variable-counting shape rank
    (Stocker et al., WWW'08 — see _SHAPE_RANK): a pure function of the
    query. With *stats* (from predicate_stats), it is the estimated
    cardinality (_pattern_cost), which knows that ``?s rare:pred ?o``
    beats ``?s rdf:type ?o`` even though the shapes tie. Ties resolve
    by written position, so the result is deterministic and a
    pre-ordered query is left alone. Inner joins commute, so the
    solution set is identical for any order (pinned by test)."""
    def vars_of(pattern) -> set:
        return {t for t in pattern
                if isinstance(t, str) and _is_var(t)}

    if stats is not None:
        def key(ip):
            return (_pattern_cost(ip[1], stats), ip[0])
    else:
        def key(ip):
            return (_pattern_rank(ip[1]), ip[0])

    remaining = list(enumerate(patterns))
    remaining.sort(key=key)
    out = [remaining.pop(0)[1]]
    bound = vars_of(out[0])
    while remaining:
        connected = [ip for ip in remaining if vars_of(ip[1]) & bound]
        pick = min(connected, key=key) if connected else remaining[0]
        remaining.remove(pick)
        out.append(pick[1])
        bound |= vars_of(pick[1])
    return out


def match_bgp(triples: DataFrame, patterns: list[tuple],
              project: list[str] | None = None,
              optional: list[tuple] | None = None,
              bind: dict[str, str] | None = None,
              filters: list[str] | None = None,
              distinct: bool = True,
              allow_cartesian: bool = False,
              reorder: bool | dict = False,
              term_meta: list[str] | None = None,
              path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """Match a conjunction of triple patterns; columns = variable names.

    - *term_meta*: variable names whose TERM METADATA should also be
      bound as ``{var}__isiri`` / ``{var}__datatype`` / ``{var}__lang``
      columns — SPARQL's isIRI/isLiteral, DATATYPE() and LANG() builtins
      as plain column references in *filters*/*bind*/*project*. Each
      listed variable must appear in the object position of at least one
      plain required pattern; the FIRST such pattern (in evaluation
      order) binds the metadata, so the columns never become NULLable
      equi-join keys between patterns.

    - *reorder*: ``True`` applies the stats-free selectivity heuristic
      (reorder_patterns) before joining instead of following written
      order; a dict (from ``predicate_stats``) applies the
      cardinality-estimating order instead — same solution set either
      way (inner joins commute), smaller intermediates when the query
      author didn't hand-order.

    - *optional*: patterns LEFT-joined after the required conjunction
      (SPARQL OPTIONAL) — unmatched rows keep NULL for the pattern's new
      variables. Each must share at least one variable with the required
      part.
    - *bind*: SPARQL BIND — new variable -> SQL expression over the
      already-bound columns (``{"local": "substring(m, 38)"}``), applied
      after the joins and before *filters* so filters can reference bound
      variables. Pure per-row projections: no shuffle, stays inside
      whole-stage codegen. Rebinding an existing variable raises (SPARQL
      forbids BIND onto an in-scope variable).
    - *filters*: SQL boolean expressions over the variable columns
      (SPARQL FILTER), e.g. ``"r LIKE '%monorepo%'"``. Applied before
      projection; Catalyst pushes them as far down the join tree as
      their column references allow.
    - A predicate string ending in ``+`` is a one-or-more property
      path (SPARQL ``pred+``) bounded at *path_max_hops*: the pattern
      matches the bounded transitive closure of that predicate
      (graph.reachability) instead of a single triple scan.
    - *distinct* applies set semantics to the projected result (SPARQL
      SELECT DISTINCT) — with ``project`` narrowing columns, duplicates
      are the norm, and the dedup runs on the narrow projection.
    """
    if reorder:
        patterns = reorder_patterns(
            patterns, stats=reorder if isinstance(reorder, dict) else None)
    pending = set(term_meta or ())

    def _plain_obj_var(pat) -> str | None:
        """The object variable of a PLAIN pattern (no path syntax)."""
        if len(pat) != 3 or isinstance(pat[1], tuple):
            return None
        p, o = pat[1], pat[2]
        if isinstance(p, str) and not _is_var(p) and (
                p.startswith(("!", "^")) or "|" in p
                or p.endswith(("+", "*", "?"))):
            return None
        if isinstance(o, str) and _is_var(o) and len(o) > 1:
            return o[1:]
        return None

    def compile_one(pat):
        take: frozenset = frozenset()
        ov = _plain_obj_var(pat)
        if ov is not None and ov in pending:
            take = frozenset([ov])
            pending.discard(ov)
        return _compile_pattern(triples, pat, path_max_hops, meta_vars=take)

    out = _match_patterns(
        compile_one,
        patterns, project=project, optional=optional, bind=bind,
        filters=filters, distinct=distinct, allow_cartesian=allow_cartesian)
    if pending:
        raise ValueError(
            f"term_meta variables never bound in an object position of a "
            f"plain required pattern: {sorted(pending)}")
    return out


def _match_patterns(compile_fn, patterns: list[tuple],
                    project: list[str] | None = None,
                    optional: list[tuple] | None = None,
                    bind: dict[str, str] | None = None,
                    filters: list[str] | None = None,
                    distinct: bool = True,
                    allow_cartesian: bool = False) -> DataFrame:
    """The pattern-accumulation core shared by match_bgp and
    kg/dataset.match_quads: *compile_fn* maps one pattern tuple to its
    filtered projection; everything else (join-on-shared-vars, OPTIONAL,
    BIND, FILTER, projection, set semantics) is identical for triples
    and quads."""
    if not patterns:
        raise ValueError("empty pattern list")
    acc = None
    for pattern in patterns:
        nxt = compile_fn(pattern)
        if not nxt.columns:
            # fully-constant pattern = SPARQL existence constraint: keep
            # the accumulated rows iff at least one triple matches. limit(1)
            # makes the probe an early-exit scan and the cross join a
            # 1-or-0-row multiplier — never a row-duplicating product.
            nxt = nxt.select(F.lit(1).alias("__exists__")).limit(1) \
                .select(F.lit(True).alias("__exists__"))
            acc = nxt if acc is None else acc.crossJoin(nxt)
            acc = acc.drop("__exists__")
            continue
        if acc is None:
            acc = nxt
            continue
        if not acc.columns:
            # accumulated state is a pure existence guard (0 or 1 rows,
            # no columns): multiply it in, never a duplicating product
            acc = acc.crossJoin(nxt)
            continue
        shared = [c for c in nxt.columns if c in acc.columns]
        if shared:
            acc = acc.join(nxt, shared, "inner")
        elif allow_cartesian:
            acc = acc.crossJoin(nxt)
        else:
            raise ValueError(
                f"pattern {pattern!r} shares no variable with the "
                "preceding patterns (pass allow_cartesian=True to force)")
    for pattern in optional or []:
        nxt = compile_fn(pattern)
        shared = [c for c in nxt.columns if c in acc.columns]
        if not shared:
            raise ValueError(
                f"optional pattern {pattern!r} shares no variable with "
                "the required patterns")
        acc = acc.join(nxt, shared, "left")
    for name, expr in (bind or {}).items():
        if name in acc.columns:
            raise ValueError(
                f"BIND target ?{name} is already bound (SPARQL forbids "
                "rebinding an in-scope variable)")
        acc = acc.withColumn(name, F.expr(expr))
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    if project is not None:
        missing = [v for v in project if v not in acc.columns]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        acc = acc.select(*project)
    return acc.distinct() if distinct else acc


def subquery_bgp(triples: DataFrame, patterns: list[tuple],
                 sub: DataFrame, project: list[str] | None = None,
                 filters: list[str] | None = None,
                 distinct: bool = True,
                 path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL 1.1 sub-SELECT: *sub* is the inner query's already-evaluated
    solution set (typically :func:`aggregate_bgp` output — SPARQL evaluates
    the subquery first, bottom-up) joined into the outer BGP on the
    variables the subquery PROJECTS (solution compatibility is by variable
    name, exactly our column-name join). The inner set is usually
    aggregated and therefore small next to the outer solution multiset, so
    AQE picks a broadcast join — the 10^12-row outer stream never shuffles
    for it. A subquery projecting no outer variable is rejected loudly:
    SPARQL would make it a cartesian multiplier, never intended here."""
    outer = match_bgp(triples, patterns, distinct=False,
                      path_max_hops=path_max_hops)
    shared = [c for c in sub.columns if c in outer.columns]
    if not shared:
        raise ValueError(
            "subquery projects no variable shared with the outer patterns "
            "— the join would be cartesian")
    acc = outer.join(sub, shared, "inner")
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    if project is not None:
        missing = [v for v in project if v not in acc.columns]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        acc = acc.select(*project)
    return acc.distinct() if distinct else acc


def union_bgp(triples: DataFrame, groups: list[list[tuple]],
              project: list[str], distinct: bool = True,
              path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL UNION: match each pattern group independently and union
    their *project* projections (set semantics by default;
    ``distinct=False`` keeps SPARQL's bag semantics). Projection is
    mandatory — UNION branches bind different variable sets, and SPARQL
    aligns them by NAME; requiring an explicit projection keeps that
    alignment visible instead of silently NULL-padding."""
    if not groups:
        raise ValueError("empty group list")
    parts = [
        match_bgp(triples, g, project=project, distinct=False,
                  path_max_hops=path_max_hops)
        for g in groups
    ]
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    return acc.distinct() if distinct else acc


def minus_bgp(triples: DataFrame, patterns: list[tuple],
              minus: list[tuple], project: list[str] | None = None,
              filters: list[str] | None = None, distinct: bool = True,
              path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL MINUS: solutions of *patterns* with no compatible solution
    in *minus* (compatibility = agreement on the variables SHARED BY THE
    FULL BINDINGS — the anti-join runs before any projection or filter,
    so ``project=['f']`` cannot silently shrink the shared-variable set
    and change what gets removed; review r2). *filters* and *project*
    then apply to the surviving solutions, matching
    ``SELECT ... WHERE { patterns MINUS {...} FILTER ... }``.

    Compiles to a LEFT ANTI join on the shared variable columns — the
    same shuffle shape as the FK-integrity check (J1), so AQE broadcast/
    skew handling applies unchanged. The minus group must share at least
    one variable, otherwise (per SPARQL semantics on disjoint domains)
    nothing would ever be removed — rejected loudly instead."""
    left = match_bgp(triples, patterns, distinct=False,
                     path_max_hops=path_max_hops)
    right = match_bgp(triples, minus, distinct=False,
                      path_max_hops=path_max_hops)
    shared = [c for c in right.columns if c in left.columns]
    if not shared:
        raise ValueError(
            "MINUS group shares no variable with the required patterns — "
            "it would remove nothing (SPARQL disjoint-domain semantics)")
    # one narrow distinct on the join key only (the wide-row distinct a
    # default match_bgp would add is pure waste before an anti-join)
    acc = left.join(right.select(*shared).distinct(), shared, "left_anti")
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    if project is not None:
        missing = [v for v in project if v not in acc.columns]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        acc = acc.select(*project)
    return acc.distinct() if distinct else acc


def aggregate_bgp(triples: DataFrame, patterns: list[tuple],
                  group_by: list[str], aggs: dict[str, str],
                  having: list[str] | None = None,
                  optional: list[tuple] | None = None,
                  filters: list[str] | None = None,
                  path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL GROUP BY + aggregates over a matched BGP.

    *aggs* maps output column -> SQL aggregate expression over the bound
    variables (``{"n_imports": "count(distinct m)"}``); *having* filters
    the aggregated rows (SPARQL HAVING). The match runs with bag
    semantics (``distinct=False``) because SPARQL aggregates operate on
    the solution MULTISET — a premature distinct would silently turn
    count() into count(distinct). One hash aggregation keyed by the
    group variables; Spark's partial aggregation combines map-side, so a
    hot group never concentrates raw solution rows on one reducer."""
    sols = match_bgp(triples, patterns, optional=optional, filters=filters,
                     distinct=False, path_max_hops=path_max_hops)
    missing = [v for v in group_by if v not in sols.columns]
    if missing:
        raise ValueError(f"group_by variables not bound: {missing}")
    out = sols.groupBy(*group_by).agg(
        *[F.expr(expr).alias(name) for name, expr in aggs.items()])
    for expr in having or []:
        out = out.filter(F.expr(expr))
    return out


def ask(triples: DataFrame, patterns: list[tuple],
        filters: list[str] | None = None,
        path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL ASK: one row ``(ask boolean)`` — true iff the pattern has
    at least one solution. ``limit(1)`` bounds the probe (CollectLimit
    short-circuits the scan after the first match; the solution set is
    never materialized or shuffled), so an ASK over 10^12 triples costs
    one early-exit pass at worst and usually far less."""
    sol = match_bgp(triples, patterns, filters=filters, distinct=False,
                    allow_cartesian=True, path_max_hops=path_max_hops)
    return sol.limit(1).agg(
        (F.count(F.lit(1)) > 0).alias("ask"))


def solution_modifiers(df: DataFrame, order_by: list[str] | None = None,
                       limit: int | None = None,
                       offset: int | None = None) -> DataFrame:
    """SPARQL ORDER BY / LIMIT / OFFSET over a solution set.

    ORDER BY entries are SQL sort expressions (``"n DESC"``, ``"r"``).
    ORDER BY + LIMIT compiles to TakeOrderedAndProject — a per-partition
    top-k heap plus a single k-row merge on the driver, never a global
    sort of the solution set. OFFSET is native (``DataFrame.offset``,
    Spark ≥3.4): with ORDER BY + LIMIT it folds into the same
    TakeOrderedAndProject heap (offset+limit rows per partition, head
    dropped at the merge); without a limit it is an executor-side global
    skip — never a driver-side collect of the solution set."""
    def _sort_expr(e: str):
        # F.expr("n DESC") silently drops the direction (parses as `n`);
        # peel the ASC/DESC suffix explicitly
        head, _, tail = e.rpartition(" ")
        if head and tail.upper() in ("ASC", "DESC"):
            c = F.expr(head)
            return c.desc() if tail.upper() == "DESC" else c.asc()
        return F.expr(e)

    if order_by:
        df = df.orderBy(*[_sort_expr(e) for e in order_by])
    if offset:
        df = df.offset(offset)
    if limit is not None:
        df = df.limit(limit)
    return df


def construct(triples: DataFrame, patterns: list[tuple],
              template: list[tuple],
              optional: list[tuple] | None = None,
              filters: list[str] | None = None,
              path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL CONSTRUCT: instantiate *template* triples from every BGP
    solution and return them in the standard triple schema.

    Each template entry is ``(subj, pred, obj[, obj_is_iri])`` where a
    term starting with ``?`` substitutes the bound variable and anything
    else is a constant; ``obj_is_iri`` defaults to True (CONSTRUCT
    output that targets a literal object passes False). Entries whose
    variables are unbound in a solution (possible under OPTIONAL) drop
    that instantiation, per the SPARQL CONSTRUCT spec.

    Scale shape: the solution set is matched ONCE with bag semantics;
    each template is a pure projection of it, unioned and
    set-deduplicated — CONSTRUCT returns an RDF *graph*, so the dedup is
    semantic, not cosmetic. The dedup keys are the instantiated triple
    columns (narrow strings), never the solution multiset."""
    sols = match_bgp(triples, patterns, optional=optional, filters=filters,
                     distinct=False, path_max_hops=path_max_hops)
    return _instantiate_template(sols, template)


def _instantiate_template(sols: DataFrame,
                          template: list[tuple]) -> DataFrame:
    """Template instantiation core shared by construct and
    construct_incremental: one projection per template entry over the
    solution set, unioned, set-deduped on the triple columns."""
    def term_col(term: str):
        return F.col(term[1:]) if _is_var(term) else F.lit(term)

    outs = []
    for entry in template:
        s, p, o = entry[0], entry[1], entry[2]
        obj_is_iri = entry[3] if len(entry) > 3 else True
        for t in (s, p, o):
            if _is_var(t) and t[1:] not in sols.columns:
                raise ValueError(f"template variable {t!r} not bound")
        inst = sols.select(
            term_col(s).cast("string").alias("subj"),
            term_col(p).cast("string").alias("pred"),
            term_col(o).cast("string").alias("obj"),
            F.lit(bool(obj_is_iri)).alias("obj_is_iri"),
            F.lit(None).cast("string").alias("obj_datatype"),
            F.lit(None).cast("string").alias("obj_lang"),
        ).filter(F.col("subj").isNotNull() & F.col("pred").isNotNull()
                 & F.col("obj").isNotNull())
        outs.append(inst)
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out.dropDuplicates(["subj", "pred", "obj"])


def construct_incremental(old_triples: DataFrame, delta: DataFrame,
                          patterns: list[tuple],
                          template: list[tuple],
                          filters: list[str] | None = None,
                          old_view: DataFrame | None = None) -> DataFrame:
    """Delta-rule maintenance of a CONSTRUCT materialized view: the NEW
    view rows the *delta* triples add, so that

        construct(old ∪ delta) == construct(old) ∪ this

    (CONSTRUCT over a BGP is monotone — new triples never remove
    solutions — so maintenance is insert-only).

    Delta solutions via the standard delta rule: for patterns p1..pn,
    Δsols = ⋃_i (p1..p_{i-1} over NEW ⋈ Δp_i ⋈ p_{i+1}..pn over OLD)
    — every term contains exactly one delta-bound factor. The Δ factor
    joins FIRST and the remaining patterns attach greedily along
    shared variables, so each join chain stays delta-sized end to end:
    the old graph is probed per term, never re-joined against itself.

    Plain variable-bearing patterns only — property paths are not
    decomposable this way (one new edge can create closure pairs
    between two OLD nodes); recompute path templates in full.

    Pass *old_view* (the materialized construct(old)) to anti-join
    re-derived rows away; without it the result may overlap the old
    view (still correct under the union above — the view is a set)."""
    for pat in patterns:
        p = pat[1] if len(pat) == 3 else None
        if (not isinstance(p, str)
                or (not p.startswith("?")
                    and (p.startswith(("!", "^")) or "|" in p
                         or p.endswith(("+", "*", "?"))))):
            raise ValueError(
                f"construct_incremental takes plain patterns only: {pat!r}")
    new_triples = old_triples.unionByName(delta)
    n = len(patterns)
    delta_sols = None
    for i in range(n):
        parts = []
        for j, pat in enumerate(patterns):
            src = (new_triples if j < i
                   else (delta if j == i else old_triples))
            parts.append(_compile_pattern(src, pat))
        acc = parts[i]
        remaining = [j for j in range(n) if j != i]
        while remaining:
            pick = next((j for j in remaining
                         if set(parts[j].columns) & set(acc.columns)),
                        None)
            if pick is None:
                raise ValueError(
                    "construct_incremental needs a connected BGP "
                    f"(no shared variable reaches {remaining!r})")
            shared = [c for c in parts[pick].columns if c in acc.columns]
            acc = acc.join(parts[pick], shared, "inner")
            remaining.remove(pick)
        delta_sols = (acc if delta_sols is None
                      else delta_sols.unionByName(acc))
    for expr in filters or []:
        delta_sols = delta_sols.filter(F.expr(expr))
    out = _instantiate_template(delta_sols, template)
    if old_view is not None:
        out = out.join(old_view.select("subj", "pred", "obj"),
                       ["subj", "pred", "obj"], "left_anti")
    return out


def describe(triples: DataFrame, subjects: DataFrame,
             max_hops: int = 8) -> DataFrame:
    """SPARQL DESCRIBE as a concise bounded description (CBD): all
    triples whose subject is in *subjects*, plus — recursively — the
    triples of every blank node reached as an OBJECT of an included
    triple (the standard CBD closure; named IRIs are boundaries, blank
    nodes are internal structure that cannot be referenced from outside
    the result and so must be expanded).

    *subjects* is a one-column DataFrame (``subj``). Blank nodes are the
    ``_:``-prefixed identifiers the emitters produce (operators/emit.py
    skolem ids).

    Scale shape: semi-naive frontier expansion like graph.reachability —
    each round semi-joins the triple table on the (usually small)
    frontier, collects newly-seen bnode objects via one anti-join
    against the done set, and stops when the frontier drains (CSVW
    envelope graphs have depth <= 4: group -> table -> row -> describes).
    The per-round driver probe is a bounded isEmpty; the triple table is
    never collected."""
    done = subjects.select("subj").distinct()
    frontier = done
    acc = None
    for _ in range(max_hops):
        t = triples.join(frontier, "subj", "leftsemi")
        acc = t if acc is None else acc.unionByName(t)
        new = (
            t.filter(F.col("obj_is_iri") & F.col("obj").startswith("_:"))
            .select(F.col("obj").alias("subj")).distinct()
            .join(done, "subj", "left_anti"))
        if new.isEmpty():
            break
        done = done.unionByName(new)
        frontier = new
    # duplicates only arise if a subject lands in two frontiers (it
    # cannot — done gates the frontier) — keep the defensive set anyway,
    # on ALL columns so distinct (s,p,o,datatype/lang) variants survive
    return acc.dropDuplicates()


def exists_bgp(triples: DataFrame, patterns: list[tuple],
               exists: list[tuple], negate: bool = False,
               project: list[str] | None = None,
               filters: list[str] | None = None, distinct: bool = True,
               path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL ``FILTER EXISTS`` / ``FILTER NOT EXISTS``: keep (or drop)
    solutions for which the *exists* group matches under the solution's
    bindings.

    Deliberately distinct from :func:`minus_bgp` — the classic SPARQL
    divergence: with NO shared variables, MINUS removes nothing
    (disjoint domains are never compatible, so minus_bgp rejects the
    call), while NOT EXISTS evaluates the group as a plain truth test —
    one non-empty match eliminates EVERY solution. This function
    implements the EXISTS semantics: shared variables become a
    semi/anti join; a variable-disjoint group becomes a 1-or-0-row
    existence probe multiplied in (limit(1), never a row-duplicating
    product — the same guard shape match_bgp uses for fully-constant
    patterns).

    Compiles to LEFT SEMI (EXISTS) or LEFT ANTI (NOT EXISTS) on the
    shared variable columns — J1's join shape, AQE broadcast/skew
    handling unchanged."""
    left = match_bgp(triples, patterns, distinct=False,
                     path_max_hops=path_max_hops)
    right = match_bgp(triples, exists, distinct=False,
                      path_max_hops=path_max_hops)
    shared = [c for c in right.columns if c in left.columns]
    if shared:
        acc = left.join(right.select(*shared).distinct(), shared,
                        "left_anti" if negate else "leftsemi")
    else:
        # truth-test: does the group match AT ALL? (SPARQL EXISTS on a
        # variable-disjoint group). limit(1) probe, early-exit scan.
        probe = right.limit(1).select(F.lit(True).alias("__e__"))
        if negate:
            # keep all solutions iff the probe is EMPTY
            acc = left.join(probe, F.lit(True), "left_anti")
        else:
            acc = left.crossJoin(probe).drop("__e__")
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    if project is not None:
        missing = [v for v in project if v not in acc.columns]
        if missing:
            raise ValueError(f"projected variables not bound: {missing}")
        acc = acc.select(*project)
    return acc.distinct() if distinct else acc


def values_bgp(triples: DataFrame, patterns: list[tuple],
               values: list[dict],
               project: list[str] | None = None,
               filters: list[str] | None = None, distinct: bool = True,
               path_max_hops: int = DEFAULT_PATH_MAX_HOPS) -> DataFrame:
    """SPARQL VALUES: join the solution multiset with an inline binding
    table. *values* is a list of ``{var: term}`` dicts; a dict may omit
    variables that other rows bind (SPARQL UNDEF) — such a row simply
    does not constrain them. Every variable any row binds must be bound
    by *patterns*.

    Scale shape: the VALUES table is inline data — it becomes a
    broadcast-hash join against the solutions, i.e. a selective filter
    pushed into the match rather than a post-hoc driver loop. When the
    VALUES variables cover a pattern's constant position this is exactly
    the 'parameter batch' idiom (run one plan for N keys instead of N
    plans). UNDEF rows group by their bound-variable set: one broadcast
    join per group, results unioned."""
    if not values:
        raise ValueError("empty VALUES list")
    cols = sorted(set().union(*[set(v) for v in values]))
    sols = match_bgp(triples, patterns, distinct=False,
                     path_max_hops=path_max_hops)
    missing = [c for c in cols if c not in sols.columns]
    if missing:
        raise ValueError(f"VALUES variables not bound by patterns: {missing}")
    spark = triples.sparkSession
    if not cols:
        # every row is all-UNDEF: a pure wildcard block
        acc = sols
    elif all(sorted(v) == cols for v in values):
        vals = spark.createDataFrame(
            [tuple(v[c] for c in cols) for v in values],
            ", ".join(f"{c} string" for c in cols))
        acc = sols.join(F.broadcast(vals.distinct()), cols, "inner")
    else:
        groups: dict[tuple, list] = {}
        for v in values:
            groups.setdefault(tuple(sorted(v)), []).append(v)
        acc = None
        for key, grp in sorted(groups.items()):
            if key:
                vals = spark.createDataFrame(
                    [tuple(v[c] for c in key) for v in grp],
                    ", ".join(f"{c} string" for c in key))
                part = sols.join(F.broadcast(vals.distinct()),
                                 list(key), "inner")
            else:  # all-UNDEF row: matches every solution
                part = sols
            acc = part if acc is None else acc.unionByName(part)
    for expr in filters or []:
        acc = acc.filter(F.expr(expr))
    if project is not None:
        bad = [v for v in project if v not in acc.columns]
        if bad:
            raise ValueError(f"projected variables not bound: {bad}")
        acc = acc.select(*project)
    return acc.distinct() if distinct else acc
