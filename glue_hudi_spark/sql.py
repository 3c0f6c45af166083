"""SQL text entry point for the native table format: ``GhsSql`` routes
the handful of DDL/DML forms a lakehouse user writes by hand —
``CREATE TABLE ... USING ghs_table``, ``INSERT INTO``, ``INSERT
OVERWRITE``, ``UPDATE``, ``DELETE FROM``, ``MERGE INTO``, ``ALTER TABLE
ADD COLUMN``, ``DROP TABLE`` — to the corresponding ``NativeTable``
calls, and passes reads (``SELECT``/``WITH``/``VALUES``) through
``spark.sql`` with every registered table visible as a temp view.

This generalizes the reference's one SQL entry (the window-dedup query
built as text and run via ``spark.sql``, processData.py:317-327) into a
full DDL/DML surface: Spark's own Python DataSource API is read-only
(``sources/datasource.py`` raises on ``writer()`` by API design), so a
SQL-only user previously had no write path at all.

Statement skeletons are recognized with anchored regexes;
**expressions are never parsed here** — WHERE predicates, SET
right-hand sides, MERGE clause conditions and VALUES lists are handed
verbatim to Spark (``F.expr`` / ``spark.sql``), so the full Spark SQL
expression language works everywhere an expression can appear. Scale
shape: each form lands on the same pruned/indexed NativeTable paths the
Python API uses (a SQL ``DELETE ... WHERE`` gets the same column-stats
file pruning as ``delete_where``); the dispatcher adds zero driver-side
data movement.

Table-shape options ride Hudi's spark-sql CREATE TABLE convention
(TBLPROPERTIES ``primaryKey``, ``preCombineField``, ``type``='cow|mor'
— the names the reference's write config emits, processData.py:64-78),
plus this engine's extensions (``partitionKeys`` via PARTITIONED BY,
``statsCols``, ``bloomIndex``, ...).

Beyond single statements the dispatcher carries: multi-table
transactions (``BEGIN``/``COMMIT``/``ROLLBACK`` with ``SAVEPOINT`` /
``ROLLBACK TO`` / ``RELEASE`` nesting), materialized views bound to the
incremental-maintenance machinery (``CREATE/REFRESH/DROP MATERIALIZED
VIEW``; ``'refresh'='auto'`` for eager per-statement maintenance,
``'refresh'='commit:N'`` for deferred every-Nth-commit batching),
Delta-parity history reads (``VERSION/TIMESTAMP AS OF``,
``table_changes('t', from [, to])``), ``COPY INTO`` bookmarked file
ingestion, ``CREATE TABLE ... SHALLOW CLONE``, ``RESTORE TABLE``,
partition-scoped ``OPTIMIZE ... WHERE``, a metadata-only
``SELECT COUNT(*)`` fast path, and ``EXPLAIN`` prefixed with the
manifest-level file-prune decision Spark's plan can't show.
"""

from __future__ import annotations

import json
import re
from contextlib import contextmanager
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from glue_hudi_spark.storage.native import NativeTable

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*|`[^`]+`"


class TxnConflictError(RuntimeError):
    """A foreign writer's commit landed on a table while this session
    held an open BEGIN..COMMIT — the transaction's OCC head-check
    failed. The open transaction is aborted; NOTHING was restored
    (a ROLLBACK restore_to would delete the foreign commit)."""


def _unq(name: str) -> str:
    name = name.strip()
    return name[1:-1] if name.startswith("`") else name


def _stable_token(text: str) -> str:
    """Deterministic 8-hex token for temp-view names derived from TVF
    argument text (hash() is process-seeded — names must be stable so
    repeated statements rebind the same view instead of leaking one
    per call)."""
    import hashlib

    return hashlib.md5(text.encode()).hexdigest()[:8]


def _split_top(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at paren/quote depth 0 (column lists, SET lists,
    VALUES tuples)."""
    parts, depth, cur, i, q = [], 0, [], 0, None
    while i < len(text):
        ch = text[i]
        if q:
            cur.append(ch)
            if ch == "\\" and q != "`" and i + 1 < len(text):
                # Spark string literals are C-style escaped: \' \\ etc.
                # — the escaped char must not close the quote
                cur.append(text[i + 1])
                i += 1
            elif ch == q and not (i + 1 < len(text) and text[i + 1] == q):
                q = None
            elif ch == q:
                cur.append(text[i + 1])
                i += 1
        elif ch in "'\"`":
            q = ch
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _mask_literals(text: str) -> str:
    """Same-length copy with the CONTENTS of quoted literals (and
    backtick identifiers) replaced by spaces, so keyword regexes can run
    on the mask while substring spans still index into the original —
    a WHERE like ``note = 'x AND y'`` must not look like a conjunction
    (round-10 advice: the unmasked scan produced bogus prune bounds)."""
    out, i, q, n = list(text), 0, None, len(text)
    while i < n:
        ch = text[i]
        if q:
            if ch == "\\" and q != "`" and i + 1 < n:
                out[i] = out[i + 1] = " "
                i += 1
            elif ch == q and not (q != "`" and i + 1 < n
                                  and text[i + 1] == q):
                q = None
            else:
                out[i] = " "
                if ch == q:  # doubled quote ('' inside a literal)
                    out[i + 1] = " "
                    i += 1
        elif ch in "'\"`":
            q = ch
        i += 1
    return "".join(out)


def _split_and_top(text: str) -> list[str]:
    """Split a predicate on top-level ``AND`` — word-boundary, outside
    quotes AND outside parens (a nested ``f(a AND b)`` stays whole)."""
    masked = _mask_literals(text)
    parts, depth, start = [], 0, 0
    for m in re.finditer(r"[()\[\]]|\bAND\b", masked, re.IGNORECASE):
        tok = m.group(0)
        if tok in "([":
            depth += 1
        elif tok in ")]":
            depth -= 1
        elif depth == 0:
            parts.append(text[start:m.start()].strip())
            start = m.end()
    parts.append(text[start:].strip())
    return parts


def _parse_props(text: str) -> dict[str, str]:
    """TBLPROPERTIES / OPTIONS body: 'k'='v' [, ...] (quotes optional)."""
    props = {}
    for item in _split_top(text):
        if not item:
            continue
        k, _, v = item.partition("=")
        props[_unq(k.strip().strip("'\""))] = v.strip().strip("'\"")
    return props


def _strip_comments(text: str) -> str:
    return re.sub(r"--[^\n]*", "", text)


def _balanced_end(text: str) -> int | None:
    """Index one past the paren that closes ``text[0] == '('``, honoring
    single/double-quoted literals; None when unbalanced."""
    depth, i, q = 0, 0, None
    while i < len(text):
        ch = text[i]
        if q:
            if ch == "\\" and i + 1 < len(text):
                i += 1  # escaped char can't close the literal
            elif ch == q:
                q = None
        elif ch in "'\"":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return None


class GhsSql:
    """Dispatches SQL text to NativeTable calls. One instance holds a
    name → NativeTable registry: ``CREATE TABLE`` adds entries (files
    land under ``warehouse/<name>`` unless LOCATION is given), and
    pre-built handles attach via ``tables=`` or :meth:`register`."""

    def __init__(self, spark: SparkSession, warehouse: str | Path,
                 tables: dict[str, NativeTable] | None = None):
        self.spark = spark
        self.warehouse = Path(warehouse)
        self.tables: dict[str, NativeTable] = {}
        # durable catalog: CREATE TABLE persists each table's config as
        # <root>/_table.json (NativeTable.save_properties), so a fresh
        # GhsSql over the same warehouse re-attaches every table — SQL
        # state survives the session. Explicit handles override.
        if self.warehouse.is_dir():
            for d in sorted(self.warehouse.iterdir()):
                if (d / "_table.json").is_file():
                    self.tables[d.name] = NativeTable.open(spark, d)
        self.tables.update(tables or {})
        # materialized views: name -> MaterializedAgg/MaterializedJoin
        # (the state NativeTable is ALSO registered in self.tables so
        # reads/DESCRIBE/BEGIN-snapshots see it; write statements are
        # guarded by _target). Durable like tables: the definition
        # persists as <state-root>/_mview.json and re-attaches here —
        # second pass, since an MV's bases must already be registered.
        self.mviews: dict[str, object] = {}
        self._mv_specs: dict[str, dict] = {}
        if self.warehouse.is_dir():
            for d in sorted(self.warehouse.iterdir()):
                f = d / "_mview.json"
                if f.is_file() and d.name not in self.tables:
                    spec = json.loads(f.read_text())
                    bases = ([spec.get("base")] if spec["kind"] == "agg"
                             else [spec.get("fact"), spec.get("dim")])
                    if all(b in self.tables for b in bases):
                        self._attach_mview(d.name, spec)
        # name -> (commit_id, wall_time) of the head the bound temp view
        # reflects; _with_views skips re-binding when unchanged, so a
        # multi-statement session pays one snapshot-plan build per table
        # per WRITE, not per statement. wall_time disambiguates a
        # restore_to + republish that reuses a commit id.
        self._view_cache: dict[str, tuple] = {}
        # open transaction: name -> head commit id at BEGIN (0 = table
        # had no commits), plus the set of tables CREATEd inside the
        # transaction (rolled back by deregistration/removal). None =
        # autocommit. See _begin/_commit_txn/_rollback.
        self._txn: dict[str, int] | None = None
        self._txn_created: set[str] = set()
        # OCC writer identity: every commit published while one of THIS
        # session's statements executes is stamped with this tag
        # (storage.commits.WRITER_TAG). COMMIT/ROLLBACK/ROLLBACK TO walk
        # each BEGIN-snapshot table's commits past its recorded head and
        # verify every one carries the tag — an untagged/foreign commit
        # means a concurrent writer interleaved and restore_to would
        # clobber it; the transaction aborts with TxnConflictError.
        import uuid

        self._writer_tag = uuid.uuid4().hex[:12]
        # name -> (heads-at-savepoint, created-at-savepoint); insertion
        # order = declaration order (ROLLBACK TO discards later ones)
        self._txn_savepoints: dict[str, tuple] = {}
        # name -> constraints list at BEGIN (restored on rollback —
        # constraints persist in _table.json outside the commit protocol)
        self._txn_constraints: dict[str, list] = {}
        # stored (non-materialized) views: name -> SELECT text, planned
        # fresh at every bind so they always read the CURRENT snapshot
        # of their base tables; durable as <warehouse>/_views.json.
        # Insertion order = creation order, so a view may reference
        # earlier views.
        self.views: dict[str, str] = {}
        vf = self.warehouse / "_views.json"
        if vf.is_file():
            self.views = dict(json.loads(vf.read_text()))
        self._txn_views: dict[str, str] | None = None
        # view names whose binding must be (re)built at the next
        # _with_views — newly created, or restored by a rollback
        self._views_pending: set[str] = set(self.views)
        # CACHE TABLE: name -> the persisted snapshot DataFrame. Session
        # state only (Spark's own CACHE TABLE semantics); _with_views
        # releases an entry when the table's head moves, so a write
        # invalidates the cache instead of serving a stale snapshot.
        self._cached: dict[str, DataFrame] = {}

    def register(self, name: str, table: NativeTable) -> None:
        if name in self.tables:
            # re-binding a live name: release the old table's CACHE
            # TABLE pin and drop its view-cache key — a coincidental
            # (commit_id, wall_time) match on the NEW table would
            # otherwise keep serving the old table's pinned snapshot
            self._release_cache(name)
            self._view_cache.pop(name, None)
        self.tables[name] = table

    # ------------------------------------------------------------- entry

    def sql(self, text: str) -> DataFrame | None:
        """Execute one statement (or several, ``;``-separated, in
        order). Returns the last statement's DataFrame for reads, None
        for DDL/DML."""
        from glue_hudi_spark.storage.commits import WRITER_TAG

        out = None
        for stmt in _split_top(_strip_comments(text), ";"):
            if stmt.strip():
                token = WRITER_TAG.set(self._writer_tag)
                try:
                    out = self._one(stmt.strip())
                except Exception as exc:
                    if self._txn is not None:
                        # all-or-nothing inside an explicit transaction:
                        # a failing statement aborts the whole thing (the
                        # BEGIN; ...; COMMIT batch form has no way to
                        # handle the error mid-flight)
                        try:
                            self._rollback()
                        except TxnConflictError as conflict:
                            # a foreign commit blocks the abort-path
                            # restore too: surface BOTH facts — chain
                            # the conflict from the statement's own
                            # error, and flag that the failed
                            # statement's partial commits stay durable
                            # (the documented all-or-nothing restore
                            # could not run)
                            raise TxnConflictError(
                                f"{conflict} — raised while aborting a "
                                f"failed statement ({exc!r}); that "
                                "statement's partially-applied commits "
                                "remain durable (no table restored)"
                            ) from exc
                    raise
                finally:
                    WRITER_TAG.reset(token)
        return out

    @contextmanager
    def tagged_writes(self):
        """Opt a Python-API write INTO this session's transaction:
        commits published inside the block carry the session's writer
        tag, so the OCC ownership check treats them as the
        transaction's own (restorable by ROLLBACK) instead of a foreign
        writer's (protected — ROLLBACK aborts with TxnConflictError
        rather than clobber them). The mixed SQL+Python-API shape
        ``register()`` exists for, made explicit."""
        from glue_hudi_spark.storage.commits import WRITER_TAG

        token = WRITER_TAG.set(self._writer_tag)
        try:
            yield
        finally:
            WRITER_TAG.reset(token)

    def _clear_txn_state(self) -> None:
        self._txn, self._txn_created = None, set()
        self._txn_savepoints = {}
        self._txn_constraints = {}
        self._txn_views = None

    def _occ_check(self, op: str) -> None:
        """OCC ownership check (multi-writer honesty): BEGIN..COMMIT
        holds no locks, so a foreign writer's commit landing anywhere
        inside the transaction would be silently deleted by ROLLBACK's
        ``restore_to``. Before COMMIT / ROLLBACK / ROLLBACK TO act, walk
        each BEGIN-snapshot table's commits past its recorded head:
        every one must carry THIS session's writer tag (stamped by
        ``storage.commits.WRITER_TAG`` around every statement). An
        untagged or other-tagged commit observed at check time — the
        timeline is lock-free, so a foreign commit landing AFTER this
        walk but before the restore completes is inherently racy;
        ``_restore_heads`` re-verifies per table immediately before
        each ``restore_to`` to shrink (not close) that window — aborts
        the transaction: state is cleared, NO table is restored (the
        only safe choice — this session's statements are already durable
        per-statement commits, and restoring would destroy the foreign
        writer's), and TxnConflictError names the conflicts. Tables
        ``register()``ed mid-transaction are outside the BEGIN snapshot:
        they are neither checked nor restored (documented scope — the
        transaction protects the tables it began with). A session's own
        partial commits from a statement that failed MID-statement stay
        tagged, so the all-or-nothing error rollback still restores
        them."""
        if self._txn is None:
            return
        dirty = []
        for name, saved in self._txn.items():
            t = self.tables.get(name)
            if t is None:
                continue
            # history(since=saved) skips the pre-BEGIN prefix by
            # filename — O(txn commits) manifest parses, not O(retained)
            for c in t.timeline.history(since=saved):
                tag = c.stats.get("writer")
                if tag != self._writer_tag:
                    dirty.append(
                        f"{name} (commit {c.commit_id} by "
                        f"{'untagged writer' if not tag else tag!r})")
        if dirty:
            self._clear_txn_state()
            raise TxnConflictError(
                f"ghs.sql: {op} aborted — concurrent writer detected on "
                f"{', '.join(dirty)}; transaction state discarded, no "
                "table restored (this session's statements remain as "
                "ordinary commits; the foreign commit is preserved)")

    def _one(self, s: str) -> DataFrame | None:
        head = s.split(None, 2)[0].upper() if s.split() else ""
        if head == "BEGIN" or (head == "START"
                               and s.upper().split()[:2]
                               == ["START", "TRANSACTION"]):
            return self._begin(s)
        if head == "COMMIT":
            return self._commit_txn(s)
        if head == "SAVEPOINT":
            return self._savepoint(s)
        if head == "RELEASE":
            return self._release_savepoint(s)
        if head == "ROLLBACK":
            self._require_txn("ROLLBACK")
            rm = self._ROLLBACK_TO.match(s)
            if rm:
                return self._rollback_to(_unq(rm.group("name")))
            if s.upper().split() not in (["ROLLBACK"],
                                         ["ROLLBACK", "TRANSACTION"]):
                raise ValueError(
                    f"ghs.sql: cannot parse {s[:60]!r} — use ROLLBACK "
                    "[TRANSACTION] or ROLLBACK TO [SAVEPOINT] name")
            return self._rollback()
        if self._txn is not None and head in ("DROP", "VACUUM"):
            raise ValueError(
                f"ghs.sql: {head} is not allowed inside a transaction — "
                "it deletes files restore cannot bring back (COMMIT or "
                "ROLLBACK first)")
        if self._txn is not None and head == "COPY":
            raise ValueError(
                "ghs.sql: COPY INTO is not allowed inside a transaction "
                "— its processed-file ledger commits outside the table "
                "protocol, so a rolled-back transaction would strand "
                "the batch as 'already loaded' (COMMIT or ROLLBACK "
                "first; COPY is itself idempotent)")
        if head == "CREATE":
            return self._create(s)
        if head == "REFRESH":
            return self._refresh_mv(s)
        if head == "INSERT":
            return self._insert(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "DELETE":
            return self._delete(s)
        if head == "MERGE":
            return self._merge(s)
        if head == "ALTER":
            return self._alter(s)
        if head == "DROP":
            return self._drop(s)
        if head == "TRUNCATE":
            return self._truncate(s)
        if head == "SHOW":
            return self._show(s)
        if head in ("DESCRIBE", "DESC"):
            return self._describe(s)
        if head == "OPTIMIZE":
            return self._optimize(s)
        if head == "ANALYZE":
            return self._analyze(s)
        if head == "CACHE":
            return self._cache_table(s)
        if head == "UNCACHE":
            return self._uncache_table(s)
        if head == "VACUUM":
            return self._vacuum(s)
        if head == "EXPLAIN":
            return self._explain(s)
        if head == "COPY":
            return self._copy_into(s)
        if head == "RESTORE":
            return self._restore(s)
        if head in ("SELECT", "WITH", "VALUES", "TABLE"):
            return self._read(s)
        raise ValueError(f"ghs.sql: unsupported statement: {s[:80]!r}")

    # ------------------------------------------------------------- helpers

    def _table(self, name: str) -> NativeTable:
        t = self.tables.get(_unq(name))
        if t is None:
            raise ValueError(
                f"ghs.sql: unknown table {name!r} — CREATE it with USING "
                f"ghs_table or attach a handle via register()")
        return t

    def _target(self, name: str) -> NativeTable:
        """A table handle that a WRITE statement may target: resolves
        like :meth:`_table` but rejects materialized views — their
        state is derived; modify the base table(s) and ``REFRESH``."""
        if _unq(name) in self.mviews:
            raise ValueError(
                f"ghs.sql: {_unq(name)!r} is a MATERIALIZED VIEW — it is "
                "read-only (write to its base table(s), then REFRESH "
                f"MATERIALIZED VIEW {_unq(name)})")
        return self._table(name)

    def _release_cache(self, name: str) -> None:
        df = self._cached.pop(name, None)
        if df is not None:
            df.unpersist()

    def _with_views(self):
        moved: set[str] = set()
        for name, t in self.tables.items():
            head = t.timeline.latest()
            if head is None:
                # an empty, never-written table has no snapshot yet —
                # readable as an empty relation would need a schema;
                # skip (the view appears after its first write). Drop
                # any stale view a pre-restore bind left behind.
                if self._view_cache.pop(name, None) is not None:
                    self.spark.catalog.dropTempView(name)
                self._release_cache(name)
                continue
            key = (head.commit_id, head.wall_time)
            if self._view_cache.get(name) == key:
                continue  # view already reflects the head manifest
            # a moved head invalidates a CACHE TABLE pin: release it
            # rather than serve the pre-write snapshot from memory
            self._release_cache(name)
            t.read_snapshot().createOrReplaceTempView(name)
            self._view_cache[name] = key
            moved.add(name)
        if self.views and (moved or self._views_pending):
            # (re)plan ONLY the stored views whose base tables (or
            # upstream views) moved: a temp view captures the plan at
            # creation, so a stale one would keep reading the OLD
            # snapshot relation — but replanning all V views on every
            # head move is O(V) driver analysis per statement for
            # unrelated work. Transitive: a view over a replanned view
            # replans too (insertion order = creation order, so
            # upstream views precede their dependents).
            replanned: set[str] = set(moved)
            for vname, q in self.views.items():
                if vname in self._views_pending or \
                        self._mentions(q, replanned):
                    try:
                        self.spark.sql(self._rewrite_tvfs(
                            self._rewrite_time_travel(q))
                        ).createOrReplaceTempView(vname)
                    except Exception as e:
                        raise ValueError(
                            f"ghs.sql: stored view {vname!r} failed to "
                            f"bind against the current catalog ({e}) — "
                            f"DROP VIEW {vname} or restore its bases"
                        ) from e
                    replanned.add(vname)
            self._views_pending = set()

    @staticmethod
    def _mentions(text: str, names: set) -> bool:
        """Word-boundary reference check on the literal-masked text —
        the dependency notion DROP guards and view replanning share. A
        name inside a string constant is not a reference; a column that
        happens to share a table's name is a FALSE POSITIVE we accept
        (over-replanning is cheap, over-guarding a DROP is safe)."""
        if not names:
            return False
        pat = r"\b(" + "|".join(re.escape(n) for n in sorted(names)) \
            + r")\b"
        return re.search(pat, _mask_literals(text),
                         re.IGNORECASE) is not None

    # time travel in reads: Delta/Iceberg SQL's ``t VERSION AS OF n`` /
    # ``t TIMESTAMP AS OF 'ts'`` — each occurrence binds a temp view over
    # the manifest-resolved historical snapshot (an O(manifest) driver
    # lookup; the scan itself stays lazy/pruned) and the reference is
    # rewritten to that view before Spark parses the text.
    _TIME_TRAVEL = re.compile(
        rf"\b(?P<name>{_IDENT})\s+(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF"
        rf"\s+(?P<val>\d+|'[^']*')", re.IGNORECASE)

    def _rewrite_time_travel(self, s: str) -> str:
        def sub(m: "re.Match[str]") -> str:
            name = _unq(m.group("name"))
            t = self.tables.get(name)
            if t is None:
                return m.group(0)
            if m.group("kind").upper() == "VERSION":
                alias = f"{name}__v{m.group('val')}"
                df = t.read_snapshot(as_of=int(m.group("val")))
            else:
                ts = m.group("val").strip("'")
                alias = f"{name}__t{re.sub('[^0-9]', '', ts)}"
                df = t.read_snapshot(as_of_timestamp=ts)
            df.createOrReplaceTempView(alias)
            return alias
        return self._TIME_TRAVEL.sub(sub, s)

    # Delta's CDC read TVF: ``table_changes('t', from [, to])`` in any
    # read (or DML source) binds a temp view over the table's
    # PER-VERSION change feed — Delta-CDF rows (_change_type ∈ insert/
    # update_preimage/update_postimage/delete) with _commit_version and
    # _commit_timestamp attribution, so a windowed/sessionized SQL read
    # can rank a key's changes by commit (r13: was the endpoint-diff
    # change_feed, which collapses an update-then-delete key and
    # carries no version column — Delta's TVF does not). Bounds: FROM
    # commit exclusive, TO commit inclusive (omitted TO = head); either
    # bound may be a quoted ISO-8601 timestamp (Delta's timestamp form),
    # resolved to the newest commit published at or before it.
    # Planning is O(window versions) pruned manifest diffs; the corpus
    # is never rescanned.
    _TABLE_CHANGES = re.compile(
        r"\btable_changes\s*\(\s*'(?P<name>[^']+)'\s*,"
        r"\s*(?:(?P<a>\d+)|'(?P<ats>[^']+)')\s*"
        r"(?:,\s*(?:(?P<b>\d+)|'(?P<bts>[^']+)')\s*)?\)", re.IGNORECASE)

    def _rewrite_table_changes(self, s: str) -> str:
        def ts_bound(t, name: str, ts: str, which: str) -> int:
            # Delta's timestamp form: a bound string resolves to the
            # newest commit published AT OR BEFORE it; FROM stays
            # exclusive of that commit (changes strictly after the
            # instant), TO inclusive — the same alignment as the id form
            c = t.timeline.at_timestamp(ts)
            if c is None:
                raise ValueError(
                    f"ghs.sql: table_changes: no retained commit of "
                    f"{name!r} at or before {ts!r} ({which} bound)")
            return c.commit_id

        def sub(m: "re.Match[str]") -> str:
            t = self.tables.get(m.group("name"))
            if t is None:
                raise ValueError(
                    f"ghs.sql: table_changes: unknown table "
                    f"{m.group('name')!r}")
            if m.group("ats") is not None:
                a = ts_bound(t, m.group("name"), m.group("ats"), "FROM")
            else:
                a = int(m.group("a"))
            head = t.timeline.latest()
            if m.group("bts") is not None:
                b = ts_bound(t, m.group("name"), m.group("bts"), "TO")
            elif m.group("b"):
                b = int(m.group("b"))
            elif head is None:
                raise ValueError(
                    f"ghs.sql: table_changes: {m.group('name')!r} has "
                    "no commits yet")
            else:
                b = head.commit_id
            alias = f"{m.group('name')}__ch{a}_{b}"
            t.table_changes(a, b).createOrReplaceTempView(alias)
            return alias
        return self._TABLE_CHANGES.sub(sub, s)

    # TimescaleDB-shaped time-series TVFs (SURVEY §2.5 extension; the
    # reference's one SQL entry point, processData.py:317-327, set the
    # precedent that SQL is a first-class face of this engine). Both
    # rewrite to the existing operators in operators/timeseries.py —
    # the SQL surface adds no second implementation:
    #
    #   time_bucket_gapfill('src', 'day', 'ts', 'k1,k2',
    #       'sum(value) AS day_value[; avg(x) AS m]'
    #       [, 'locf,interpolate,max_buckets=N'])
    #     -> dense per-key grid view: keys..., bucket, <name>...,
    #        is_gap, <name>_locf..., <name>_interp..., [_gf_clamped]
    #
    #   lttb('src', 'ts', 'value', n_out [, 'k1,k2' [, pack_buckets]])
    #     -> shape-preserving downsample view: keys..., ts, value
    #
    # 'src' is a registered table (read at head) or any bound view.
    # Options default to the operator defaults (locf on, interpolate
    # off, uncapped grid; lttb auto-sizes its pack buckets).
    _TS_GAPFILL = re.compile(
        r"\btime_bucket_gapfill\s*\(\s*'(?P<src>[^']+)'\s*,"
        r"\s*'(?P<unit>[^']+)'\s*,\s*'(?P<ts>[^']+)'\s*,"
        r"\s*'(?P<keys>[^']*)'\s*,\s*'(?P<aggs>[^']+)'"
        r"(?:\s*,\s*'(?P<opts>[^']*)')?\s*\)", re.IGNORECASE)
    _TS_LTTB = re.compile(
        r"\blttb\s*\(\s*'(?P<src>[^']+)'\s*,\s*'(?P<ts>[^']+)'\s*,"
        r"\s*'(?P<val>[^']+)'\s*,\s*(?P<n>\d+)"
        r"(?:\s*,\s*'(?P<keys>[^']*)'(?:\s*,\s*(?P<pack>\d+))?)?\s*\)",
        re.IGNORECASE)
    _TS_AGG_ITEM = re.compile(
        rf"^(?P<expr>.+?)\s+AS\s+(?P<out>{_IDENT})\s*$",
        re.IGNORECASE | re.DOTALL)

    def _ts_source(self, who: str, name: str) -> DataFrame:
        t = self.tables.get(name)
        if t is not None:
            return t.read_snapshot()
        try:
            return self.spark.table(name)
        except Exception:
            raise ValueError(
                f"ghs.sql: {who}: unknown table or view {name!r}")

    def _rewrite_timeseries(self, s: str) -> str:
        from glue_hudi_spark.operators.timeseries import (
            lttb_downsample, resample_gapfill)

        def gapfill(m: "re.Match[str]") -> str:
            keys = [k.strip() for k in m.group("keys").split(",")
                    if k.strip()]
            values = {}
            for item in m.group("aggs").split(";"):
                am = self._TS_AGG_ITEM.match(item.strip())
                if not am:
                    raise ValueError(
                        "ghs.sql: time_bucket_gapfill: each aggregate "
                        f"must be '<expr> AS <name>' (got {item!r}); "
                        "separate several with ';'")
                values[_unq(am.group("out"))] = F.expr(am.group("expr"))
            locf, interp, max_buckets = True, False, None
            for opt in (m.group("opts") or "").split(","):
                opt = opt.strip().lower()
                if not opt:
                    continue
                if opt == "locf":
                    locf = True
                elif opt == "nolocf":
                    locf = False
                elif opt == "interpolate":
                    interp = True
                elif opt.startswith("max_buckets="):
                    max_buckets = int(opt.split("=", 1)[1])
                else:
                    raise ValueError(
                        "ghs.sql: time_bucket_gapfill: unknown option "
                        f"{opt!r} (locf | nolocf | interpolate | "
                        "max_buckets=N)")
            out = resample_gapfill(
                self._ts_source("time_bucket_gapfill", m.group("src")),
                keys=keys, ts_col=m.group("ts"), values=values,
                unit=m.group("unit").lower(), locf=locf,
                interpolate=interp, max_buckets=max_buckets)
            alias = (f"{m.group('src')}__gf_"
                     f"{_stable_token(m.group(0))}")
            out.createOrReplaceTempView(alias)
            return alias

        def lttb(m: "re.Match[str]") -> str:
            keys = [k.strip() for k in (m.group("keys") or "").split(",")
                    if k.strip()]
            out = lttb_downsample(
                self._ts_source("lttb", m.group("src")),
                keys=keys, ts_col=m.group("ts"),
                value_col=m.group("val"), n_out=int(m.group("n")),
                pack_buckets=(int(m.group("pack"))
                              if m.group("pack") else None))
            alias = f"{m.group('src')}__lttb_{_stable_token(m.group(0))}"
            out.createOrReplaceTempView(alias)
            return alias

        s = self._TS_GAPFILL.sub(gapfill, s)
        return self._TS_LTTB.sub(lttb, s)

    def _rewrite_tvfs(self, s: str) -> str:
        """All read-side TVF rewrites, in one place: change-feed reads
        first (a time-series TVF may not wrap one — its source must be
        a name), then the time-series functions, then the secondary-
        index probes."""
        return self._rewrite_index_tvfs(
            self._rewrite_timeseries(self._rewrite_table_changes(s)))

    # ------------------------------------------------- secondary indexes
    #
    # SQL face for the two persisted secondary indexes the Python API
    # carries (operators/dedup_index.DedupIndex, operators/vector_index.
    # VectorIndex) — Hudi's spark-sql exposes index DDL the same way
    # (CREATE INDEX ... USING <type>); the reference itself configures
    # Hudi's record-key index through write options only
    # (processData.py:64-78), so SQL index DDL is the lakehouse-parity
    # extension. Index state lives ON DISK next to the table
    # (_index/dedup/meta.json, _index/ivf/<col>/meta.json), so every
    # statement here re-binds from the meta — indexes survive sessions
    # and SHOW INDEXES needs no session registry.

    _CREATE_INDEX = re.compile(
        rf"^CREATE\s+(?P<kind>DEDUP|VECTOR)\s+INDEX\s+"
        rf"(?P<ine>IF\s+NOT\s+EXISTS\s+)?ON\s+(?P<name>{_IDENT})\s*"
        rf"\(\s*(?P<col>{_IDENT})\s*\)"
        rf"(?:\s+OPTIONS\s*\((?P<opts>[^)]*)\))?\s*$", re.IGNORECASE)
    _REFRESH_INDEX = re.compile(
        rf"^REFRESH\s+(?P<kind>DEDUP|VECTOR)\s+INDEX\s+ON\s+"
        rf"(?P<name>{_IDENT})\s*(?:\(\s*(?P<col>{_IDENT})\s*\))?\s*$",
        re.IGNORECASE)
    _DROP_INDEX = re.compile(
        rf"^DROP\s+(?P<kind>DEDUP|VECTOR)\s+INDEX\s+"
        rf"(?P<ie>IF\s+EXISTS\s+)?ON\s+(?P<name>{_IDENT})\s*"
        rf"(?:\(\s*(?P<col>{_IDENT})\s*\))?\s*$", re.IGNORECASE)
    _SHOW_INDEXES = re.compile(
        rf"^SHOW\s+INDEXES\s+(?:ON|FROM)\s+(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)

    @staticmethod
    def _index_opts(raw: str | None, who: str, allowed: dict) -> dict:
        """Parse ``k = v, ...`` OPTIONS. ``allowed`` maps option name →
        coercion (int/str); unknown keys raise (typos must not
        silently become defaults)."""
        out: dict = {}
        for item in (raw or "").split(","):
            item = item.strip()
            if not item:
                continue
            if "=" not in item:
                raise ValueError(
                    f"ghs.sql: {who}: OPTIONS entries are k = v "
                    f"(got {item!r})")
            k, v = (p.strip() for p in item.split("=", 1))
            k = k.lower()
            if k not in allowed:
                raise ValueError(
                    f"ghs.sql: {who}: unknown option {k!r} "
                    f"(known: {sorted(allowed)})")
            v = v[1:-1] if v.startswith("'") and v.endswith("'") else v
            out[k] = allowed[k](_unq(v))
        return out

    def _dedup_index(self, t: NativeTable):
        """Re-bind the table's persisted dedup index from its on-disk
        meta (None if never created)."""
        from glue_hudi_spark.operators.dedup_index import DedupIndex

        meta_p = Path(t.root) / "_index" / "dedup" / "meta.json"
        if not meta_p.exists():
            return None
        meta = json.loads(meta_p.read_text())
        return DedupIndex(
            t, id_col=meta["id_col"], text_col=meta["text_col"],
            n=meta["n"], num_hashes=meta["num_hashes"],
            bands=meta["bands"], prefix_len=meta["prefix_len"],
            probe_pushdown_max=meta.get("probe_pushdown_max", 0),
            probe_bloom_max=meta.get("probe_bloom_max", 0))

    def _vector_indexes(self, t: NativeTable) -> list:
        """All persisted IVF indexes on the table (one per vector
        column), re-bound from their on-disk meta."""
        from glue_hudi_spark.operators.vector_index import VectorIndex

        base = Path(t.root) / "_index" / "ivf"
        out = []
        if base.is_dir():
            for d in sorted(base.iterdir()):
                ix = VectorIndex(t, vec_col=d.name)
                if ix.exists():
                    out.append(ix)
        return out

    def _one_vector_index(self, t: NativeTable, col: str | None,
                          who: str):
        ixs = self._vector_indexes(t)
        if col:
            for ix in ixs:
                if ix.vec_col == _unq(col):
                    return ix
            raise ValueError(
                f"ghs.sql: {who}: no VECTOR INDEX on column "
                f"{_unq(col)!r} (existing: {[i.vec_col for i in ixs]})")
        if not ixs:
            raise ValueError(
                f"ghs.sql: {who}: table has no VECTOR INDEX — "
                "CREATE VECTOR INDEX first")
        if len(ixs) > 1:
            raise ValueError(
                f"ghs.sql: {who}: table has VECTOR INDEXes on "
                f"{[i.vec_col for i in ixs]} — name the column")
        return ixs[0]

    def _no_txn_index(self, verb: str) -> None:
        if self._txn is not None:
            raise ValueError(
                f"ghs.sql: {verb} is not allowed inside a transaction "
                "— index stores commit outside the table protocol, so "
                "ROLLBACK could not undo them (COMMIT or ROLLBACK "
                "first)")

    def _create_index(self, m: "re.Match[str]") -> None:
        self._no_txn_index("CREATE INDEX")
        kind = m.group("kind").upper()
        t = self._target(m.group("name"))
        col = _unq(m.group("col"))
        if kind == "DEDUP":
            opts = self._index_opts(
                m.group("opts"), "CREATE DEDUP INDEX",
                {"id_col": str, "n": int, "num_hashes": int,
                 "bands": int, "prefix_len": int,
                 "probe_pushdown_max": int, "probe_bloom_max": int})
            if "id_col" not in opts:
                raise ValueError(
                    "ghs.sql: CREATE DEDUP INDEX needs OPTIONS "
                    "(id_col = <numeric id column>) — probe results "
                    "key on it")
            if self._dedup_index(t) is not None:
                if m.group("ine"):
                    return None
                raise ValueError(
                    f"ghs.sql: table {_unq(m.group('name'))!r} already "
                    "has a DEDUP INDEX — DROP DEDUP INDEX first")
            from glue_hudi_spark.operators.dedup_index import DedupIndex

            DedupIndex(t, text_col=col, **opts).build()
            return None
        opts = self._index_opts(
            m.group("opts"), "CREATE VECTOR INDEX",
            {"id_col": str, "n_centroids": int, "train_iters": int})
        id_col = opts.pop("id_col", None)
        if id_col is None:
            raise ValueError(
                "ghs.sql: CREATE VECTOR INDEX needs OPTIONS "
                "(id_col = <numeric id column>)")
        from glue_hudi_spark.operators.vector_index import VectorIndex

        ix = VectorIndex(t, vec_col=col)
        if ix.exists():
            if m.group("ine"):
                return None
            raise ValueError(
                f"ghs.sql: table {_unq(m.group('name'))!r} already has "
                f"a VECTOR INDEX on {col!r} — DROP VECTOR INDEX first")
        ix.build(id_col=id_col, **opts)
        return None

    def _refresh_index(self, m: "re.Match[str]") -> None:
        self._no_txn_index("REFRESH INDEX")
        t = self._target(m.group("name"))
        if m.group("kind").upper() == "DEDUP":
            ix = self._dedup_index(t)
            if ix is None:
                raise ValueError(
                    f"ghs.sql: table {_unq(m.group('name'))!r} has no "
                    "DEDUP INDEX — CREATE DEDUP INDEX first")
            if m.group("col") and _unq(m.group("col")) != ix.text_col:
                raise ValueError(
                    f"ghs.sql: the DEDUP INDEX is on "
                    f"{ix.text_col!r}, not {_unq(m.group('col'))!r}")
        else:
            ix = self._one_vector_index(
                t, m.group("col"), "REFRESH VECTOR INDEX")
        ix.refresh()
        return None

    def _drop_index(self, m: "re.Match[str]") -> None:
        import shutil

        self._no_txn_index("DROP INDEX")
        t = self._target(m.group("name"))
        kind = m.group("kind").upper()
        if kind == "DEDUP":
            root = Path(t.root) / "_index" / "dedup"
            ix = self._dedup_index(t)
            if ix is None:
                if m.group("ie"):
                    return None
                raise ValueError(
                    f"ghs.sql: table {_unq(m.group('name'))!r} has no "
                    "DEDUP INDEX")
            if m.group("col") and _unq(m.group("col")) != ix.text_col:
                raise ValueError(
                    f"ghs.sql: the DEDUP INDEX is on "
                    f"{ix.text_col!r}, not {_unq(m.group('col'))!r}")
        else:
            try:
                ix = self._one_vector_index(
                    t, m.group("col"), "DROP VECTOR INDEX")
            except ValueError:
                if m.group("ie"):
                    return None
                raise
            root = ix.root
        shutil.rmtree(root, ignore_errors=True)
        return None

    def _show_indexes(self, name: str) -> DataFrame:
        t = self._table(name)
        head = t.timeline.latest()
        rows = []
        ix = self._dedup_index(t)
        if ix is not None:
            meta = json.loads((ix.root / "meta.json").read_text())
            shown = {k: meta[k] for k in
                     ("id_col", "n", "num_hashes", "bands",
                      "prefix_len")}
            shown.update({k: meta[k] for k in
                          ("probe_pushdown_max", "probe_bloom_max")
                          if meta.get(k)})
            rows.append(
                ("dedup", meta["text_col"],
                 json.dumps(shown, sort_keys=True),
                 meta["indexed_commit"],
                 head is not None
                 and head.commit_id != meta["indexed_commit"]))
        for vx in self._vector_indexes(t):
            st = vx.status()
            meta = json.loads((vx.root / "meta.json").read_text())
            rows.append(
                ("ivf", vx.vec_col,
                 json.dumps({"id_col": meta["id_col"],
                             "n_centroids": meta["n_centroids"],
                             "train_iters": meta["train_iters"]},
                            sort_keys=True),
                 meta["indexed_commit"], bool(st.get("stale"))))
        return self.spark.createDataFrame(
            rows or [],
            "kind string, column string, options string, "
            "indexed_commit string, stale boolean")

    _TVF_DEDUP_PROBE = re.compile(
        r"\bdedup_probe\s*\(\s*'(?P<tbl>[^']+)'\s*,"
        r"\s*'(?P<batch>[^']+)'"
        r"(?:\s*,\s*(?P<thr>\d*\.?\d+))?"
        r"(?:\s*,\s*'(?P<opts>[^']*)')?\s*\)", re.IGNORECASE)
    _TVF_VECTOR_SEARCH = re.compile(
        r"\bvector_search\s*\(\s*'(?P<tbl>[^']+)'\s*,"
        r"\s*'(?P<q>[^']+)'"
        r"(?:\s*,\s*(?P<k>\d+))?(?:\s*,\s*(?P<np>\d+))?"
        r"(?:\s*,\s*'(?P<col>[^']*)')?\s*\)", re.IGNORECASE)

    def _rewrite_index_tvfs(self, s: str) -> str:
        """Read-side TVFs over the persisted indexes:
        ``dedup_probe('t', 'batch'[, threshold[, 'allow_stale']])`` —
        the batch rows that are NOVEL against t's dedup index; and
        ``vector_search('t', 'queries'[, k[, nprobe[, 'vec_col']]])``
        — (query_id, neighbor_id, rank, sim) top-k off t's IVF index,
        reading only the probed cell partitions. Both bind
        deterministic temp views plain SQL composes over, exactly like
        the time-series TVFs."""

        def probe(m: "re.Match[str]") -> str:
            t = self._table(m.group("tbl"))
            ix = self._dedup_index(t)
            if ix is None:
                raise ValueError(
                    f"ghs.sql: dedup_probe: table "
                    f"{_unq(m.group('tbl'))!r} has no DEDUP INDEX — "
                    "CREATE DEDUP INDEX first")
            opts = [o.strip().lower()
                    for o in (m.group("opts") or "").split(",")
                    if o.strip()]
            bad = [o for o in opts if o != "allow_stale"]
            if bad:
                raise ValueError(
                    f"ghs.sql: dedup_probe: unknown option {bad[0]!r} "
                    "(allow_stale)")
            out = ix.probe(
                self._ts_source("dedup_probe", m.group("batch")),
                verify_threshold=(float(m.group("thr"))
                                  if m.group("thr") else 0.5),
                allow_stale="allow_stale" in opts)
            alias = (f"{m.group('tbl')}__dprobe_"
                     f"{_stable_token(m.group(0))}")
            out.createOrReplaceTempView(alias)
            return alias

        def search(m: "re.Match[str]") -> str:
            t = self._table(m.group("tbl"))
            ix = self._one_vector_index(
                t, m.group("col"), "vector_search")
            qdf = self._ts_source("vector_search", m.group("q"))
            others = [c for c in qdf.columns if c != ix.vec_col]
            if ix.vec_col not in qdf.columns or len(others) != 1:
                raise ValueError(
                    "ghs.sql: vector_search: the query source must "
                    f"have exactly two columns — an id and "
                    f"{ix.vec_col!r} (got {qdf.columns})")
            out = ix.query(
                qdf, id_col=others[0],
                k=int(m.group("k")) if m.group("k") else 10,
                nprobe=int(m.group("np")) if m.group("np") else 1)
            alias = (f"{m.group('tbl')}__vsearch_"
                     f"{_stable_token(m.group(0))}")
            out.createOrReplaceTempView(alias)
            return alias

        s = self._TVF_DEDUP_PROBE.sub(probe, s)
        return self._TVF_VECTOR_SEARCH.sub(search, s)

    _KEYWORD_ALIAS = (
        "WHERE|GROUP|ORDER|HAVING|LIMIT|WINDOW|UNION|INTERSECT|EXCEPT|"
        "VERSION|TIMESTAMP|JOIN|LEFT|RIGHT|FULL|INNER|CROSS|ON")

    def _select_prune(self, s: str) -> tuple[str, dict] | None:
        """``(table, bounds)`` when ``s`` is a single-table SELECT whose
        WHERE yields manifest prune bounds — the SQL read path's
        equivalent of ``delete_where``'s ``_where_bounds`` hookup, so a
        selective ``SELECT ... WHERE day = X`` skips files through the
        partition layout + column-stats index instead of listing every
        live file (round-10 verdict: SELECT was the one unpruned read
        path). Conservative at every step: any shape this can't prove —
        joins, multiple FROMs, comma lists, subqueries, time travel —
        returns None and the read binds the plain (unpruned) view.
        Bounds are a SUPERSET of the WHERE's matching rows by
        ``_where_bounds``'s construction, and Spark still applies the
        full WHERE row-level, so pruning never changes results."""
        masked = _mask_literals(s)
        if not re.match(r"^\s*SELECT\b", masked, re.IGNORECASE):
            return None
        if re.search(r"\b(JOIN|UNION|INTERSECT|EXCEPT|LATERAL)\b"
                     r"|\bAS\s+OF\b", masked, re.IGNORECASE):
            return None
        froms = list(re.finditer(
            rf"\bFROM\s+(?P<name>{_IDENT})"
            rf"(?:\s+(?:AS\s+)?(?!(?:{self._KEYWORD_ALIAS})\b)"
            rf"(?P<alias>{_IDENT}))?",
            masked, re.IGNORECASE))
        if len(froms) != 1:
            return None
        fm = froms[0]
        if re.match(r"\s*,", masked[fm.end():]):
            return None  # comma join: FROM a, b
        name = _unq(s[fm.start("name"):fm.end("name")])
        t = self.tables.get(name)
        if t is None or t.timeline.latest() is None:
            return None
        wm = re.search(r"\bWHERE\b", masked[fm.end():], re.IGNORECASE)
        if not wm:
            return None
        wstart = fm.end() + wm.end()
        # WHERE span ends at the first TOP-LEVEL clause keyword
        # (terminators inside parens — e.g. IN (...) lists — don't end it)
        wend, depth = len(s), 0
        for tok in re.finditer(
                r"[()\[\]]|\b(GROUP|HAVING|ORDER|LIMIT|WINDOW)\b",
                masked[wstart:], re.IGNORECASE):
            if tok.group(0) in "([":
                depth += 1
            elif tok.group(0) in ")]":
                depth -= 1
            elif depth == 0:
                wend = wstart + tok.start()
                break
        where = s[wstart:wend].strip()
        # strip table/alias qualifiers (quote-aware: spans located on the
        # mask) so `t.day >= X` terms contribute bounds
        quals = [q for q in (name, s[fm.start("alias"):fm.end("alias")]
                             if fm.group("alias") else None) if q]
        wmasked = _mask_literals(where)
        out, last = [], 0
        for qm in re.finditer(
                r"\b(" + "|".join(re.escape(q) for q in quals) + r")\.",
                wmasked, re.IGNORECASE):
            out.append(where[last:qm.start()])
            last = qm.end()
        out.append(where[last:])
        bounds = self._where_bounds(t, "".join(out))
        return (name, bounds) if bounds else None

    # metadata-only COUNT(*): Delta answers a bare count from stats;
    # the manifest carries per-file row counts AND per-file column
    # min/max, so the query shapes every dashboard fires at a 100-TB
    # table — bare COUNT(*) / MIN / MAX — cost zero data bytes (Delta's
    # stats-based query answering). Anything the manifest cannot PROVE
    # (WHERE, expressions, un-indexed columns, MoR deltas, live DV
    # marks) falls through to the real scan.
    _FAST_AGG = re.compile(
        rf"^SELECT\s+(?P<items>.+?)\s+FROM\s+(?P<name>{_IDENT})\s*$",
        re.IGNORECASE | re.DOTALL)
    _AGG_ITEM = re.compile(
        rf"^(?:(?P<cnt>COUNT\s*\(\s*(?:\*|1)\s*\))"
        rf"|(?P<fn>MIN|MAX)\s*\(\s*(?P<col>{_IDENT})\s*\))"
        rf"(?:\s+AS\s+(?P<alias>{_IDENT}))?$",
        re.IGNORECASE)
    # types whose parquet footer min/max are EXACT values from the data.
    # Strings are deliberately absent: writers may truncate long string
    # statistics (max rounded UP per the format spec) — safe for
    # pruning, but serving one as a MAX() answer would return a value
    # that exists in no row. String MIN/MAX falls through to the scan.
    # float/double are safe ONLY because _stat_value drops NaN stats at
    # indexing time (the file becomes unindexed for that column, so
    # stats_extrema returns None and this path falls to the scan —
    # where Spark's MAX correctly returns NaN-as-greatest).
    _STAT_TYPES: "dict[str, T.DataType]" = {
        "tinyint": T.ByteType(), "smallint": T.ShortType(),
        "int": T.IntegerType(), "bigint": T.LongType(),
        "float": T.FloatType(), "double": T.DoubleType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
    }

    @staticmethod
    def _stat_to_py(v, type_name: str):
        """A manifest stat value converted to the Python value Spark
        expects for the column's type (stats store JSON-safe renderings:
        numbers native, date/timestamp as ISO strings)."""
        import datetime as _dt

        if v is None:
            return None
        if type_name in ("tinyint", "smallint", "int", "bigint"):
            return int(v)
        if type_name in ("float", "double"):
            return float(v)
        if type_name == "date":
            return _dt.date.fromisoformat(v) if isinstance(v, str) else v
        return _dt.datetime.fromisoformat(v) if isinstance(v, str) else v

    def _try_fast_agg(self, m: "re.Match[str]") -> DataFrame | None:
        t = self.tables.get(_unq(m.group("name")))
        if t is None or t.timeline.latest() is None:
            return None
        parsed = []
        for item in _split_top(m.group("items")):
            im = self._AGG_ITEM.match(item.strip())
            if im is None:
                return None
            parsed.append(im)
        types = self._data_types(t)
        fields: list[T.StructField] = []
        vals: list = []
        extrema: dict[str, tuple | None] = {}
        for im in parsed:
            if im.group("cnt"):
                alias = (_unq(im.group("alias")) if im.group("alias")
                         else "count(1)")
                fields.append(T.StructField(alias, T.LongType(), False))
                vals.append(int(t.count_rows()))
                continue
            col = _unq(im.group("col"))
            fn = im.group("fn").lower()
            tn = types.get(col)
            if tn not in self._STAT_TYPES:
                return None  # unknown column / un-orderable stat type
            if col not in extrema:
                extrema[col] = t.stats_extrema(col)
            ext = extrema[col]
            if ext is None:
                return None  # manifest can't prove it — real scan
            alias = (_unq(im.group("alias")) if im.group("alias")
                     else f"{fn}({col})")
            fields.append(T.StructField(alias, self._STAT_TYPES[tn], True))
            vals.append(self._stat_to_py(ext[0 if fn == "min" else 1], tn))
        return self.spark.createDataFrame(
            [tuple(vals)], T.StructType(fields))

    def _read(self, s: str) -> DataFrame:
        fa = self._FAST_AGG.match(s)
        if fa:
            try:
                out = self._try_fast_agg(fa)
            except Exception:
                # the fast path is an OPTIMIZATION: anything it cannot
                # handle (legacy manifest without schema_json, malformed
                # stats) must fall through to the scan, never fail a
                # query the slow path can answer
                out = None
            if out is not None:
                return out
        self._with_views()
        pr = self._select_prune(s)
        if pr and pr[0] not in self._cached:
            # (a CACHE TABLE pin beats file pruning: the data is already
            # in executor memory, and rebinding would drop the pin)
            name, bounds = pr
            # bind THIS statement's view manifest-pruned; invalidate the
            # cache entry so the next statement re-binds the plain view
            self.tables[name].read_snapshot(
                prune=bounds).createOrReplaceTempView(name)
            self._view_cache.pop(name, None)
        return self.spark.sql(
            self._rewrite_tvfs(self._rewrite_time_travel(s)))

    _EXPLAIN = re.compile(
        r"^EXPLAIN(?:\s+(?P<mode>FORMATTED|EXTENDED|CODEGEN|COST))?\s+"
        r"(?P<q>(?:SELECT|WITH|VALUES|TABLE)\b.*)$",
        re.IGNORECASE | re.DOTALL)

    def _explain(self, s: str) -> DataFrame:
        """``EXPLAIN [FORMATTED|EXTENDED|CODEGEN|COST] <query>``:
        Spark's own plan over the bound views, PREFIXED by one row
        reporting the dispatcher's manifest-level file-prune decision —
        the part Spark's plan cannot show, because file skipping happens
        on the driver before the scan relation is even planned. The
        pruned binding is the same one ``_read`` would use, so the plan
        matches what the SELECT will actually run."""
        m = self._EXPLAIN.match(s)
        if not m:
            raise ValueError(
                f"ghs.sql: cannot parse EXPLAIN: {s[:80]!r} — use "
                "EXPLAIN [FORMATTED|EXTENDED|CODEGEN|COST] SELECT ...")
        q = m.group("q")
        self._with_views()
        pr = self._select_prune(q)
        if pr and pr[0] in self._cached:
            # same rule as _read: a CACHE TABLE pin beats file pruning,
            # and rebinding here would silently destroy the pin
            name = pr[0]
            note = (
                "== GHS Manifest Pruning ==\n"
                f"table {name} is pinned by CACHE TABLE: reads serve "
                "the in-memory snapshot; manifest pruning skipped")
        elif pr:
            name, bounds = pr
            t = self.tables[name]
            kept, total = t.pruned_file_count(bounds)
            t.read_snapshot(prune=bounds).createOrReplaceTempView(name)
            self._view_cache.pop(name, None)
            note = (
                "== GHS Manifest Pruning ==\n"
                f"table {name}: WHERE bounds {bounds} -> "
                f"{kept}/{total} base files survive partition-dir + "
                "column-stats skipping (applied before Spark plans the "
                "scan)")
        else:
            note = (
                "== GHS Manifest Pruning ==\n"
                "none derived (not a single-table SELECT with "
                "range-bound WHERE terms): full live-file listing; "
                "parquet row-group pushdown still applies")
        mode = (m.group("mode") or "").upper()
        rewritten = self._rewrite_tvfs(
            self._rewrite_time_travel(q))
        plan = self.spark.sql(
            f"EXPLAIN {mode} {rewritten}".replace("EXPLAIN  ", "EXPLAIN "))
        return self.spark.createDataFrame(
            [(note,)], "plan string").unionAll(plan)

    def _query_df(self, q: str) -> DataFrame:
        q = q.strip()
        if q.upper().startswith("VALUES"):
            return self.spark.sql(q)
        self._with_views()
        # DML sources get the same time-travel + change-feed rewrites as
        # reads — INSERT INTO ... SELECT FROM t VERSION AS OF n restores
        # history; ... FROM table_changes('t', a) replays a CDC window
        return self.spark.sql(
            self._rewrite_tvfs(self._rewrite_time_travel(q)))

    # ------------------------------------------------------- transactions

    def _require_txn(self, kw: str) -> None:
        if self._txn is None:
            raise ValueError(f"ghs.sql: {kw} without an open transaction "
                             "(BEGIN first)")

    def _begin(self, s: str) -> None:
        """``BEGIN [TRANSACTION]``: multi-statement, multi-TABLE
        all-or-nothing over the engine's own commit protocol — the gap
        Delta/Hudi leave open (each of their commits is single-table
        atomic; nothing spans tables). Mechanism: record every
        registered table's head commit id now; statements execute
        immediately (reads inside the transaction see its own writes —
        each write is still an ordinary atomic commit); ``COMMIT``
        forgets the snapshot; ``ROLLBACK`` — or any statement error —
        restores each moved table to its recorded head via
        ``timeline.restore_to`` (pure manifest truncation + orphan-file
        deletion) and removes tables CREATEd inside the transaction.

        MULTI-WRITER honesty (r11 verdict #5): restore truncates the
        timeline, so a FOREIGN writer's commit landing between BEGIN
        and ROLLBACK on the same table would be rolled back with ours.
        COMMIT / ROLLBACK / ROLLBACK TO therefore run an OCC
        ownership check (``_occ_check``): every commit past a
        BEGIN-snapshot table's recorded head must carry this session's
        writer tag (stamped around every statement via
        ``storage.commits.WRITER_TAG``) — a foreign commit is detected
        wherever in the transaction it landed, not only after the last
        statement; on divergence the transaction aborts with
        ``TxnConflictError``
        and restores NOTHING (this session's statements stay as the
        ordinary durable commits they already are; the foreign commit
        is preserved). True cross-process isolation still needs a
        catalog service (lakeFS-style ref store), out of scope by
        design — the check turns silent clobbering into a loud abort.
        DROP/VACUUM are rejected inside a transaction: they delete
        files restore cannot resurrect."""
        words = s.upper().split()
        if words not in (["BEGIN"], ["BEGIN", "TRANSACTION"],
                         ["START", "TRANSACTION"]):
            raise ValueError(f"ghs.sql: cannot parse {s[:40]!r} — use "
                             "BEGIN [TRANSACTION]")
        if self._txn is not None:
            raise ValueError("ghs.sql: transaction already open "
                             "(nested BEGIN is not supported)")
        heads = {}
        for name, t in self.tables.items():
            h = t.timeline.latest()
            heads[name] = h.commit_id if h else 0
        # constraints live in _table.json, OUTSIDE the commit protocol —
        # restore_to can't undo an in-transaction ADD CONSTRAINT, so
        # BEGIN snapshots them and _rollback restores + re-persists
        self._txn_constraints = {
            name: list(t.constraints) for name, t in self.tables.items()}
        self._txn_views = dict(self.views)
        self._txn = heads
        self._txn_created = set()
        self._txn_savepoints = {}
        return None

    def _commit_txn(self, s: str) -> None:
        if s.upper().split() not in (["COMMIT"], ["COMMIT", "TRANSACTION"]):
            raise ValueError(f"ghs.sql: cannot parse {s[:40]!r} — use "
                             "COMMIT [TRANSACTION]")
        self._require_txn("COMMIT")
        self._occ_check("COMMIT")
        self._clear_txn_state()
        return None

    def _remove_created(self, names, heads: dict | None = None) -> None:
        """Unregister (and delete, when warehouse-managed) tables/views
        CREATEd inside the transaction scope being rolled back."""
        import shutil

        for name in names:
            t = self.tables.pop(name, None)
            self.mviews.pop(name, None)
            self._mv_specs.pop(name, None)
            if heads is not None:
                heads.pop(name, None)
            if t is None:
                continue
            self._view_cache.pop(name, None)
            self._release_cache(name)
            self.spark.catalog.dropTempView(name)
            try:
                managed = Path(t.root).resolve().is_relative_to(
                    self.warehouse.resolve())
            except (OSError, ValueError):
                managed = False
            if managed:
                shutil.rmtree(t.root, ignore_errors=True)

    def _restore_heads(self, heads: dict) -> None:
        for name, saved in heads.items():
            t = self.tables.get(name)
            if t is None:
                continue
            h = t.timeline.latest()
            if (h.commit_id if h else 0) != saved:
                # TOCTOU shrink: _occ_check ran before this loop, but
                # the timeline is lock-free — re-verify THIS table's
                # post-snapshot commits are all ours immediately before
                # truncating them. A foreign commit that raced in since
                # the check aborts here (tables earlier in the loop are
                # already restored — the residual partiality inherent
                # to a filesystem timeline without locks).
                foreign = [
                    c.commit_id for c in t.timeline.history(since=saved)
                    if c.stats.get("writer") != self._writer_tag]
                if foreign:
                    self._clear_txn_state()
                    raise TxnConflictError(
                        f"ghs.sql: restore of {name!r} aborted — "
                        f"foreign commit(s) {foreign} landed after the "
                        "conflict check; this table is NOT restored "
                        "(the foreign writer's commits are preserved)")
                t.timeline.restore_to(saved)
                self._view_cache.pop(name, None)
                if saved == 0:
                    # timeline emptied: a temp view bound during the
                    # transaction would keep serving deleted files
                    self.spark.catalog.dropTempView(name)

    def _rollback(self) -> None:
        self._occ_check("ROLLBACK")
        txn, created = self._txn, self._txn_created
        # restore FIRST, clear the transaction record LAST: if a
        # restore_to raises mid-way (ref protection, I/O), the record
        # survives and ROLLBACK can be retried — clearing eagerly would
        # strand the untouched tables with their in-transaction commits
        # and no way back
        self._remove_created(created, txn)
        self._restore_heads(txn)
        for name, cons in self._txn_constraints.items():
            t = self.tables.get(name)
            if t is not None and list(t.constraints) != cons:
                t.constraints[:] = cons
                t.save_properties()
        if self._txn_views is not None and self._txn_views != self.views:
            for gone in set(self.views) - set(self._txn_views):
                self.spark.catalog.dropTempView(gone)
            self.views = dict(self._txn_views)
            self._save_views()
            self._views_pending = set(self.views)
        self._clear_txn_state()
        return None

    # ---- savepoints: nested rollback scopes inside an open transaction
    # (standard SQL SAVEPOINT / ROLLBACK TO / RELEASE): a savepoint
    # records every registered table's head at its creation, exactly the
    # way BEGIN does; ROLLBACK TO restores those heads, removes tables
    # CREATEd after the savepoint, discards later savepoints, and leaves
    # the transaction OPEN (the savepoint itself stays reusable). A full
    # ROLLBACK or a failing statement still aborts to the BEGIN state.

    _SAVEPOINT = re.compile(
        rf"^SAVEPOINT\s+(?P<name>{_IDENT})\s*$", re.IGNORECASE)
    _RELEASE = re.compile(
        rf"^RELEASE\s+(?:SAVEPOINT\s+)?(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)
    _ROLLBACK_TO = re.compile(
        rf"^ROLLBACK\s+TO\s+(?:SAVEPOINT\s+)?(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)

    def _savepoint(self, s: str) -> None:
        m = self._SAVEPOINT.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse SAVEPOINT: "
                             f"{s[:60]!r} — use SAVEPOINT name")
        self._require_txn("SAVEPOINT")
        heads = {}
        for name, t in self.tables.items():
            h = t.timeline.latest()
            heads[name] = h.commit_id if h else 0
        sp = _unq(m.group("name"))
        # re-declaring a savepoint moves it (standard SQL): delete first
        # so insertion order reflects the NEW position
        self._txn_savepoints.pop(sp, None)
        self._txn_savepoints[sp] = (
            heads, set(self._txn_created),
            {name: list(t.constraints)
             for name, t in self.tables.items()},
            dict(self.views))
        return None

    def _release_savepoint(self, s: str) -> None:
        m = self._RELEASE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse RELEASE: {s[:60]!r}"
                             " — use RELEASE SAVEPOINT name")
        self._require_txn("RELEASE SAVEPOINT")
        sp = _unq(m.group("name"))
        if sp not in self._txn_savepoints:
            raise ValueError(f"ghs.sql: unknown savepoint {sp!r}")
        del self._txn_savepoints[sp]
        return None

    def _rollback_to(self, sp: str) -> None:
        if sp not in self._txn_savepoints:
            raise ValueError(f"ghs.sql: unknown savepoint {sp!r}")
        self._occ_check("ROLLBACK TO")
        heads, created_at_sp, cons_at_sp, views_at_sp = \
            self._txn_savepoints[sp]
        self._remove_created(self._txn_created - created_at_sp)
        self._restore_heads(heads)
        for name, cons in cons_at_sp.items():
            t = self.tables.get(name)
            if t is not None and list(t.constraints) != cons:
                t.constraints[:] = cons
                t.save_properties()
        if views_at_sp != self.views:
            for gone in set(self.views) - set(views_at_sp):
                self.spark.catalog.dropTempView(gone)
            self.views = dict(views_at_sp)
            self._save_views()
            self._views_pending = set(self.views)
        self._txn_created = set(created_at_sp)
        # savepoints declared after sp point past the restored state
        names = list(self._txn_savepoints)
        for later in names[names.index(sp) + 1:]:
            del self._txn_savepoints[later]
        return None

    # ------------------------------------------------------------- CREATE

    _CREATE = re.compile(
        rf"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})\s*"
        rf"\((?P<cols>.*)\)\s*USING\s+ghs_table"
        rf"(?P<rest>.*)$",
        re.IGNORECASE | re.DOTALL)
    _CREATE_AS = re.compile(
        rf"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})\s+"
        rf"USING\s+ghs_table(?P<rest>.*?)\s+AS\s+"
        rf"(?P<q>(?:SELECT|WITH|VALUES|TABLE)\b.*)$",
        re.IGNORECASE | re.DOTALL)

    def _build_table(self, name: str, rest: str) -> NativeTable:
        """Shared CREATE machinery: parse PARTITIONED BY / LOCATION /
        TBLPROPERTIES and construct the (not-yet-committed) handle."""
        pm = re.search(r"PARTITIONED\s+BY\s*\(([^)]*)\)", rest,
                       re.IGNORECASE)
        lm = re.search(r"LOCATION\s+'([^']+)'", rest, re.IGNORECASE)
        tm = re.search(r"TBLPROPERTIES\s*\((.*)\)", rest,
                       re.IGNORECASE | re.DOTALL)
        props = _parse_props(tm.group(1)) if tm else {}
        keys = [k.strip() for k in
                props.get("primaryKey", "").replace(";", ",").split(",")
                if k.strip()]
        if not keys:
            raise ValueError(
                "ghs.sql: CREATE TABLE needs TBLPROPERTIES "
                "('primaryKey'='col[,col2]') — every ghs_table is keyed "
                "(the reference's control table likewise mandates "
                "primary_key per table)")
        path = Path(lm.group(1)) if lm else self.warehouse / name
        return NativeTable(
            self.spark, path, record_keys=keys,
            precombine=props.get("preCombineField") or None,
            partition_keys=([c.strip() for c in pm.group(1).split(",")]
                            if pm else []),
            storage_type=props.get("type", "cow"),
            stats_cols=[c.strip() for c in
                        props.get("statsCols", "").split(",") if c.strip()],
            sort_order=[c.strip() for c in
                        props.get("sortOrder", "").split(",") if c.strip()],
            bloom_index=props.get("bloomIndex", "").lower() == "true",
            files_per_partition=(int(props["filesPerPartition"])
                                 if props.get("filesPerPartition") else None),
        )

    _CREATE_VIEW = re.compile(
        rf"^CREATE\s+(?P<rep>OR\s+REPLACE\s+)?VIEW\s+"
        rf"(?P<name>{_IDENT})\s+AS\s+"
        rf"(?P<q>(?:SELECT|WITH|VALUES|TABLE)\b.*)$",
        re.IGNORECASE | re.DOTALL)

    def _save_views(self) -> None:
        self.warehouse.mkdir(parents=True, exist_ok=True)
        (self.warehouse / "_views.json").write_text(
            json.dumps(self.views))

    def _create_view(self, m: "re.Match[str]", s: str) -> None:
        """``CREATE [OR REPLACE] VIEW name AS SELECT ...``: a stored
        query, not a table — the text persists (``_views.json``) and is
        re-planned at every bind, so reads always see the CURRENT
        snapshot of the base tables (time travel and table_changes
        work inside the text). Views are read-only names: writes fail
        with 'unknown table'. A transaction snapshots the view registry
        at BEGIN, so CREATE/REPLACE VIEW rolls back with it."""
        name = _unq(m.group("name"))
        if name in self.tables:
            raise ValueError(
                f"ghs.sql: {name!r} is a table"
                + (" (materialized view)" if name in self.mviews else "")
                + " — view names must not shadow tables")
        if name in self.views and not m.group("rep"):
            raise ValueError(
                f"ghs.sql: view {name!r} already exists (use CREATE OR "
                "REPLACE VIEW)")
        # validate NOW against current bindings — a typo'd view must
        # fail at CREATE, not at first read
        self._with_views()
        self.spark.sql(self._rewrite_tvfs(
            self._rewrite_time_travel(m.group("q"))))
        self.views[name] = m.group("q").strip()
        self._save_views()
        self._views_pending.add(name)
        return None

    _CREATE_CLONE = re.compile(
        rf"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})"
        rf"\s+SHALLOW\s+CLONE\s+(?P<src>{_IDENT})\s*$", re.IGNORECASE)

    def _create(self, s: str) -> None:
        im = self._CREATE_INDEX.match(s)
        if im:
            return self._create_index(im)
        if re.match(r"^CREATE\s+MATERIALIZED\s+VIEW\b", s, re.IGNORECASE):
            return self._create_mview(s)
        vm = self._CREATE_VIEW.match(s)
        if vm:
            return self._create_view(vm, s)
        cm = self._CREATE_CLONE.match(s)
        if cm:
            # Delta's SHALLOW CLONE: zero-copy branch of the CURRENT
            # snapshot (hardlinked data files + one fresh manifest —
            # clone_to's O(metadata) contract); the clone is an
            # independent table from here on.
            name = _unq(cm.group("name"))
            if name in self.views:
                raise ValueError(
                    f"ghs.sql: {name!r} is a stored view — DROP VIEW "
                    "it first")
            if name in self.tables:
                if re.search(r"IF\s+NOT\s+EXISTS", s[:cm.end("name")],
                             re.IGNORECASE):
                    return None
                raise ValueError(f"ghs.sql: table {name!r} already exists")
            src_name = _unq(cm.group("src"))
            if src_name in self.mviews:
                raise ValueError(
                    f"ghs.sql: {src_name!r} is a materialized view — "
                    "clone its base table, or snapshot the view with "
                    "CREATE TABLE ... AS SELECT")
            t = self._table(src_name).clone_to(self.warehouse / name)
            t.save_properties()
            self.tables[name] = t
            if self._txn is not None:
                self._txn_created.add(name)
            return None
        m = self._CREATE.match(s)
        ctas = None if m else self._CREATE_AS.match(s)
        if not m and not ctas:
            raise ValueError(
                "ghs.sql: CREATE TABLE must be of the form CREATE TABLE "
                "name (col type, ...) USING ghs_table [PARTITIONED BY "
                "(...)] [LOCATION '...'] [TBLPROPERTIES (...)] — or the "
                "CTAS form CREATE TABLE name USING ghs_table "
                "[options] AS SELECT ...")
        mm = m or ctas
        name = _unq(mm.group("name"))
        if name in self.views:
            raise ValueError(
                f"ghs.sql: {name!r} is a stored view — DROP VIEW it "
                "first")
        if_not_exists = re.search(
            r"IF\s+NOT\s+EXISTS", s[:mm.end("name")],
            re.IGNORECASE) is not None
        if name in self.tables:
            if if_not_exists:
                return None
            raise ValueError(f"ghs.sql: table {name!r} already exists")
        t = self._build_table(name, mm.group("rest"))
        if ctas:
            t.bulk_insert(self._query_df(ctas.group("q")))
            # durable catalog entry (see __init__) — written only AFTER
            # the first commit succeeds: a failing CREATE over an
            # existing root (e.g. LOCATION pointing at a live external
            # table whose keys differ) must not clobber that table's
            # _table.json with the new config
            t.save_properties()
            self.tables[name] = t
            if self._txn is not None:
                self._txn_created.add(name)
            return None
        schema_fields = []
        defaults: list[tuple[str, str, object]] = []
        for coldef in _split_top(m.group("cols")):
            parts = coldef.split(None, 2)
            cname, ctype = _unq(parts[0]), parts[1]
            tail = parts[2] if len(parts) > 2 else ""
            dm = re.match(r"DEFAULT\s+(.+)$", tail.strip(), re.IGNORECASE)
            if dm:
                defaults.append((cname, ctype, dm.group(1)))
                continue  # added post-create so the default is recorded
            schema_fields.append(f"{cname} {ctype}")
        # an empty first commit publishes the declared schema, so the
        # table is immediately readable/alterable like any SQL table.
        # (The allow_empty guard raises when the root already holds a
        # table with history — save_properties runs only after, so a
        # failing CREATE can't clobber the existing _table.json.)
        t.bulk_insert(
            self.spark.createDataFrame([], ", ".join(schema_fields)),
            allow_empty=True)
        t.save_properties()  # durable catalog entry (see __init__)
        for cname, ctype, dexpr in defaults:
            lit = self.spark.sql(f"SELECT CAST({dexpr} AS {ctype})").first()[0]
            t.add_column(cname, ctype, default=lit)
        self.tables[name] = t
        if self._txn is not None:
            self._txn_created.add(name)
        return None

    # ------------------------------------------------- MATERIALIZED VIEW

    _CREATE_MV = re.compile(
        rf"^CREATE\s+MATERIALIZED\s+VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        rf"(?P<name>{_IDENT})\s*"
        rf"(?:TBLPROPERTIES\s*\((?P<props>.*?)\)\s*)?"
        rf"AS\s+(?P<q>SELECT\b.*)$", re.IGNORECASE | re.DOTALL)
    _MV_AGG = re.compile(
        rf"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<base>{_IDENT})\s+"
        rf"GROUP\s+BY\s+(?P<grp>.+?)\s*$", re.IGNORECASE | re.DOTALL)
    _MV_AGG_CNT = re.compile(
        r"^COUNT\s*\(\s*(?:\*|1)\s*\)\s+AS\s+cnt$", re.IGNORECASE)
    _MV_AGG_SUM = re.compile(
        rf"^SUM\s*\(\s*(?P<col>{_IDENT})\s*\)\s+AS\s+total$",
        re.IGNORECASE)
    _MV_AGG_BUCKET = re.compile(
        rf"^DATE_TRUNC\s*\(\s*'(?P<unit>hour|day|week|month|year)'\s*,"
        rf"\s*(?P<col>{_IDENT})\s*\)\s+AS\s+(?P<alias>{_IDENT})$",
        re.IGNORECASE)
    _MV_GRP_BUCKET = re.compile(
        rf"^DATE_TRUNC\s*\(\s*'(?P<unit>hour|day|week|month|year)'\s*,"
        rf"\s*(?P<col>{_IDENT})\s*\)$", re.IGNORECASE)
    _MV_JOIN = re.compile(
        rf"^SELECT\s+\*\s+FROM\s+(?P<fact>{_IDENT})\s+"
        rf"LEFT\s+(?:OUTER\s+)?JOIN\s+(?P<dim>{_IDENT})\s+"
        rf"(?:ON\s+(?P<on>.+?)|USING\s*\(\s*(?P<using>{_IDENT})\s*\))"
        rf"\s*$", re.IGNORECASE | re.DOTALL)
    _MV_JOINAGG = re.compile(
        rf"^SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<fact>{_IDENT})\s+"
        rf"(?P<jkind>LEFT\s+(?:OUTER\s+)?|INNER\s+)?"
        rf"JOIN\s+(?P<dim>{_IDENT})\s+"
        rf"(?:ON\s+(?P<on>.+?)|USING\s*\(\s*(?P<using>{_IDENT})\s*\))\s+"
        rf"GROUP\s+BY\s+(?P<grp>.+?)\s*$", re.IGNORECASE | re.DOTALL)
    _MV_ON = re.compile(
        rf"^\s*(?P<q1>{_IDENT})\.(?P<c1>{_IDENT})\s*=\s*"
        rf"(?P<q2>{_IDENT})\.(?P<c2>{_IDENT})\s*$")

    _MV_SHAPES = (
        "ghs.sql: CREATE MATERIALIZED VIEW supports exactly three "
        "maintainable query shapes — the additive aggregate "
        "'SELECT g1[, g2...], COUNT(*) AS cnt, SUM(col) AS total FROM "
        "base GROUP BY g1[, g2...]' (MaterializedAgg: O(changed groups) "
        "refresh off the change feed), the N:1 enrichment join "
        "'SELECT * FROM fact LEFT JOIN dim ON fact.k = dim.k' "
        "(MaterializedJoin: O(changes + affected facts)), and the "
        "aggregate over that join 'SELECT g1[, g2...], COUNT(*) AS "
        "cnt, SUM(col) AS total FROM fact JOIN dim ON fact.k = dim.k "
        "GROUP BY g1[, g2...]' (MaterializedJoinAgg: INNER join, both "
        "feeds, bilinear delta). Arbitrary "
        "queries have no incremental maintenance plan — use CREATE "
        "TABLE ... AS SELECT for a one-shot snapshot")

    def _mv_base(self, name: str) -> str:
        name = _unq(name)
        if name in self.mviews:
            raise ValueError(
                f"ghs.sql: {name!r} is itself a materialized view — "
                "stacked views are not maintainable (no change feed is "
                "published for view state); build on the base table")
        if name not in self.tables:
            raise ValueError(
                f"ghs.sql: unknown base table {name!r} for the "
                "materialized view")
        return name

    def _mv_on_col(self, m: "re.Match[str]", fact: str, dim: str) -> str:
        """Resolve a matched MV join's ON/USING clause to the single
        same-named join column both view classes key their state and
        merge pruning by."""
        if m.group("using"):
            return _unq(m.group("using"))
        om = self._MV_ON.match(m.group("on"))
        if not om:
            raise ValueError(self._MV_SHAPES)
        q1, c1 = _unq(om.group("q1")), _unq(om.group("c1"))
        q2, c2 = _unq(om.group("q2")), _unq(om.group("c2"))
        if c1 != c2:
            raise ValueError(
                "ghs.sql: the join column must have the SAME "
                f"name on both sides (got {c1!r} = {c2!r}) — "
                "the view keys its state and its merge "
                "pruning by one column name")
        if {q1, q2} != {fact, dim}:
            raise ValueError(
                f"ghs.sql: ON qualifiers {sorted({q1, q2})} must "
                f"be the joined tables {sorted({fact, dim})} "
                "(aliases are not supported in MV definitions)")
        return c1

    def _parse_mv_query(self, q: str, props: dict) -> dict:
        """Recognize the two maintainable shapes (see _MV_SHAPES) and
        return the durable spec dict. Conservative on purpose: anything
        unrecognized raises rather than silently materializing a
        non-refreshable snapshot."""
        q = re.sub(r"\s+", " ", q.strip())
        jm = self._MV_JOIN.match(q)
        if jm:
            fact = self._mv_base(jm.group("fact"))
            dim = self._mv_base(jm.group("dim"))
            join_col = self._mv_on_col(jm, fact, dim)
            dim_cols = ([c.strip() for c in props["dimCols"].split(",")]
                        if props.get("dimCols") else None)
            return {"kind": "join", "fact": fact, "dim": dim,
                    "join_col": join_col, "dim_cols": dim_cols,
                    "cluster_by": props.get("clusterBy") or None,
                    **self._refresh_props(props),
                    "query": q}
        jam = self._MV_JOINAGG.match(q)
        if jam:
            if jam.group("jkind") and \
                    jam.group("jkind").upper().startswith("LEFT"):
                raise ValueError(
                    "ghs.sql: the aggregate-over-join view is INNER "
                    "join only (a LEFT join's NULL groups have no "
                    "keyed-state identity) — drop LEFT, or use the "
                    "plain join view + aggregate reads")
            fact = self._mv_base(jam.group("fact"))
            dim = self._mv_base(jam.group("dim"))
            join_col = self._mv_on_col(jam, fact, dim)
            items = _split_top(jam.group("sel"))
            if len(items) < 3 or not self._MV_AGG_CNT.match(items[-2]) \
                    or not self._MV_AGG_SUM.match(items[-1]):
                raise ValueError(self._MV_SHAPES)
            sum_col = _unq(self._MV_AGG_SUM.match(items[-1]).group("col"))
            group_cols = []
            for it in items[:-2]:
                if not re.fullmatch(_IDENT, it):
                    raise ValueError(self._MV_SHAPES)
                group_cols.append(_unq(it))
            grp = [_unq(g.strip()) for g in _split_top(jam.group("grp"))]
            if grp != group_cols:
                raise ValueError(
                    f"ghs.sql: GROUP BY columns {grp} must equal the "
                    f"select list's leading columns {group_cols} — the "
                    "state table is keyed by exactly the group columns")
            dim_cols = ([c.strip() for c in props["dimCols"].split(",")]
                        if props.get("dimCols") else None)
            return {"kind": "joinagg", "fact": fact, "dim": dim,
                    "join_col": join_col, "group_cols": group_cols,
                    "sum_col": sum_col, "dim_cols": dim_cols,
                    **self._refresh_props(props),
                    "query": q}
        am = self._MV_AGG.match(q)
        if not am:
            raise ValueError(self._MV_SHAPES)
        base = self._mv_base(am.group("base"))
        items = _split_top(am.group("sel"))
        if len(items) < 3 or not self._MV_AGG_CNT.match(items[-2]) \
                or not self._MV_AGG_SUM.match(items[-1]):
            raise ValueError(self._MV_SHAPES)
        sum_col = _unq(self._MV_AGG_SUM.match(items[-1]).group("col"))
        group_cols, derive = [], {}
        for it in items[:-2]:
            dm = self._MV_AGG_BUCKET.match(it)
            if dm:
                # continuous-aggregate bucket (TimescaleDB's
                # time_bucket): a DERIVED group column, re-projected
                # onto every change-feed row at refresh — deterministic
                # and row-local, so the signed IVM algebra is unchanged
                alias = _unq(dm.group("alias"))
                group_cols.append(alias)
                # always backquote the source column: a quoted
                # identifier (space, reserved word) must survive the
                # round-trip into F.expr at refresh time
                derive[alias] = (f"date_trunc('{dm.group('unit').lower()}'"
                                 f", `{_unq(dm.group('col'))}`)")
                continue
            if not re.fullmatch(_IDENT, it):
                raise ValueError(self._MV_SHAPES)
            group_cols.append(_unq(it))
        grp = []
        for g in _split_top(am.group("grp")):
            g = g.strip()
            gm = self._MV_GRP_BUCKET.match(g)
            if gm:
                # GROUP BY repeats the bucket expression: resolve it to
                # the alias that declared the same derivation
                ex = (f"date_trunc('{gm.group('unit').lower()}'"
                      f", `{_unq(gm.group('col'))}`)")
                match = [a for a, e in derive.items() if e == ex]
                if not match:
                    raise ValueError(self._MV_SHAPES)
                grp.append(match[0])
            else:
                grp.append(_unq(g))
        if grp != group_cols:
            raise ValueError(
                f"ghs.sql: GROUP BY columns {grp} must equal the "
                f"select list's leading columns {group_cols} — the "
                "state table is keyed by exactly the group columns")
        return {"kind": "agg", "base": base, "group_cols": group_cols,
                "sum_col": sum_col,
                **({"derive": derive} if derive else {}),
                **self._refresh_props(props),
                "query": q}

    @staticmethod
    def _refresh_props(props: dict) -> dict:
        """TBLPROPERTIES 'refresh' maintenance policy (r11 verdict #7):
        absent/'' = manual (REFRESH MATERIALIZED VIEW on the user's
        cadence), 'auto' = eager per-write-statement, 'commit:N' =
        deferred batching — refresh only once N or more base commits
        have landed past the view's watermark, amortizing maintenance
        to 1/N of the write statements (per-write latency stops scaling
        with the number of auto views at high commit rates)."""
        mode = (props.get("refresh") or "").lower()
        if not mode:
            return {"auto": False}
        if mode == "auto":
            return {"auto": True}
        m = re.fullmatch(r"commit:(\d+)", mode)
        if m and int(m.group(1)) >= 1:
            return {"auto": False, "every": int(m.group(1))}
        raise ValueError(
            f"ghs.sql: unknown refresh mode {props['refresh']!r} — "
            "use 'auto' or 'commit:N' (N >= 1)")

    def _attach_mview(self, name: str, spec: dict):
        from glue_hudi_spark.streaming.materialized import (
            MaterializedAgg, MaterializedJoin, MaterializedJoinAgg)

        path = self.warehouse / name
        if spec["kind"] == "agg":
            mv = MaterializedAgg(self.spark, self.tables[spec["base"]],
                                 path, list(spec["group_cols"]),
                                 spec["sum_col"],
                                 derive=spec.get("derive"))
        elif spec["kind"] == "joinagg":
            mv = MaterializedJoinAgg(
                self.spark, self.tables[spec["fact"]],
                self.tables[spec["dim"]], path,
                join_col=spec["join_col"],
                group_cols=list(spec["group_cols"]),
                sum_col=spec["sum_col"],
                dim_cols=(list(spec["dim_cols"])
                          if spec.get("dim_cols") else None))
        else:
            mv = MaterializedJoin(
                self.spark, self.tables[spec["fact"]],
                self.tables[spec["dim"]], path,
                join_col=spec["join_col"],
                dim_cols=(list(spec["dim_cols"])
                          if spec.get("dim_cols") else None),
                cluster_by=spec.get("cluster_by") or None)
        self.mviews[name] = mv
        self._mv_specs[name] = spec
        self.tables[name] = mv.state
        return mv

    def _create_mview(self, s: str) -> None:
        """``CREATE MATERIALIZED VIEW name [TBLPROPERTIES (...)] AS
        SELECT ...``: binds the engine's incrementally-maintained view
        machinery (``streaming/materialized.py``) to the SQL surface —
        the Materialize/Snowflake-DMT form. The view materializes NOW
        (Postgres semantics) and goes STALE as its bases change;
        ``REFRESH MATERIALIZED VIEW`` absorbs the bases' change feeds —
        O(changes), never a recompute. TBLPROPERTIES: ``clusterBy`` (the
        join column — state laid out for dim-churn merge pruning),
        ``dimCols`` (projection of the dim side). The definition
        persists as ``_mview.json`` so a fresh GhsSql re-attaches it."""
        m = self._CREATE_MV.match(s)
        if not m:
            raise ValueError(
                "ghs.sql: cannot parse CREATE MATERIALIZED VIEW — use "
                "CREATE MATERIALIZED VIEW name [TBLPROPERTIES (...)] "
                "AS SELECT ...")
        name = _unq(m.group("name"))
        if name in self.views:
            raise ValueError(
                f"ghs.sql: {name!r} is a stored view — DROP VIEW it "
                "first")
        if name in self.tables:
            if re.search(r"IF\s+NOT\s+EXISTS", s[:m.end("name")],
                         re.IGNORECASE):
                return None
            raise ValueError(f"ghs.sql: table {name!r} already exists")
        props = _parse_props(m.group("props")) if m.group("props") else {}
        spec = self._parse_mv_query(m.group("q"), props)
        mv = self._attach_mview(name, spec)
        mv.refresh()
        Path(mv.state.root).mkdir(parents=True, exist_ok=True)
        (Path(mv.state.root) / "_mview.json").write_text(
            json.dumps(spec, sort_keys=True))
        if self._txn is not None:
            self._txn_created.add(name)
        return None

    _REFRESH_MV = re.compile(
        rf"^REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)

    def _refresh_mv(self, s: str) -> None:
        rim = self._REFRESH_INDEX.match(s)
        if rim:
            return self._refresh_index(rim)
        m = self._REFRESH_MV.match(s)
        if not m:
            raise ValueError(
                f"ghs.sql: cannot parse REFRESH: {s[:80]!r} — use "
                "REFRESH MATERIALIZED VIEW name or REFRESH "
                "DEDUP|VECTOR INDEX ON table")
        name = _unq(m.group("name"))
        mv = self.mviews.get(name)
        if mv is None:
            raise ValueError(
                f"ghs.sql: {name!r} is not a materialized view")
        mv.refresh()
        return None

    def _after_write(self, name: str) -> None:
        """Eager maintenance: a view declared with TBLPROPERTIES
        ('refresh'='auto') refreshes after EVERY write statement on a
        base table — always-fresh reads at per-statement refresh cost
        (each refresh is still the incremental O(changes) merge, so the
        cost scales with the statement, not the view).
        ('refresh'='commit:N') defers to every Nth base commit: the
        per-write cost is one metadata watermark check, bounding reads'
        staleness at N-1 commits. Default stays manual: REFRESH
        MATERIALIZED VIEW on the user's cadence."""
        name = _unq(name)
        for mv_name in self._mv_dependents(name):
            spec = self._mv_specs[mv_name]
            if spec.get("auto"):
                self.mviews[mv_name].refresh()
            elif spec.get("every"):
                # deferred batching ('commit:N'): a metadata-only
                # watermark check per write; the incremental refresh
                # runs once per N base commits
                mv = self.mviews[mv_name]
                if mv.pending_commits() >= spec["every"]:
                    mv.refresh()

    # ------------------------------------------------------------- INSERT

    _INSERT = re.compile(
        rf"^INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?"
        rf"(?P<name>{_IDENT})\s*(?:\((?P<cols>[^)]*)\))?\s*(?P<q>.+)$",
        re.IGNORECASE | re.DOTALL)

    def _insert(self, s: str) -> None:
        m = self._INSERT.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse INSERT: {s[:80]!r}")
        t = self._target(m.group("name"))
        df = self._query_df(m.group("q"))
        target_cols = ([_unq(c.strip()) for c in m.group("cols").split(",")]
                       if m.group("cols")
                       else [c for c in self._data_columns(t)])
        if len(df.columns) != len(target_cols):
            raise ValueError(
                f"ghs.sql: INSERT provides {len(df.columns)} columns, "
                f"table expects {len(target_cols)} ({target_cols})")
        df = df.toDF(*target_cols)
        defaults = self._data_defaults(t)
        for c, typ in self._data_types(t).items():
            if c in target_cols:
                df = df.withColumn(c, F.col(c).cast(typ))
            else:
                # SQL INSERT semantics: an omitted column takes its
                # declared DEFAULT (stored as a real value — this is a
                # post-add write), else NULL
                df = df.withColumn(c, F.lit(defaults.get(c)).cast(typ))
        if m.group("mode").upper() == "OVERWRITE":
            t.insert_overwrite(df)
        else:
            self._keyed_write(t, df)
        self._after_write(m.group("name"))
        return None

    @staticmethod
    def _keyed_write(t: NativeTable, df: DataFrame) -> None:
        """The INSERT INTO / COPY INTO write routing. FIRST data commit
        takes the bulk-load path (the reference's own choice for full
        loads) — range-clustered into the declared sortOrder/
        filesPerPartition width with footer stats and blooms. A plain
        upsert here would land the whole batch in ONE file (its rewrite
        width is the affected-file count, which is 0 on an empty table)
        — at scale, CREATE + INSERT INTO SELECT <1 TB> must not produce
        a single-file table. Precombine still resolves in-batch
        duplicate keys, matching the upsert contract. Later batches
        upsert on the primary key (Hudi spark-sql semantics)."""
        head = t.timeline.latest()
        if head is not None and (head.files or head.deltas):
            t.upsert(df)
            return
        if t.precombine:
            from pyspark.sql.window import Window

            w = Window.partitionBy(*t.record_keys).orderBy(
                F.col(t.precombine).desc())
            df = (df.withColumn("_ghs_rn", F.row_number().over(w))
                  .filter(F.col("_ghs_rn") == 1).drop("_ghs_rn"))
        t.bulk_insert(df)

    def _data_columns(self, t: NativeTable) -> list[str]:
        return [c for c, _ in self._data_types(t).items()]

    # ---------------------------------------------------------- COPY INTO

    _COPY = re.compile(
        rf"^COPY\s+INTO\s+(?P<name>{_IDENT})\s+FROM\s+'(?P<src>[^']+)'"
        rf"(?:\s+FILEFORMAT\s*=\s*(?P<fmt>[A-Za-z]+))?\s*$",
        re.IGNORECASE)

    def _copy_into(self, s: str) -> DataFrame:
        """``COPY INTO t FROM '/landing/dir' [FILEFORMAT = PARQUET|CSV|
        JSON|ORC]``: idempotent bookmarked file ingestion — the
        reference's core loop (bookmarked multi-path scan feeding a
        keyed table, processData.py + SURVEY §2.1 S1) surfaced as the
        Databricks COPY INTO statement. A per-(source, format) ledger
        under the TABLE root records processed files (the landing dir
        stays read-only), so a re-run loads only new arrivals and a
        replayed statement loads nothing; the ledger commits only AFTER
        the table write publishes — crash between the two replays the
        batch, and the keyed upsert makes the replay idempotent.
        Columns map BY NAME (extra source columns are ignored; missing
        table columns take their DEFAULT, else NULL; record keys must
        be present). Returns (num_files_loaded, num_rows_loaded)."""
        m = self._COPY.match(s)
        if not m:
            raise ValueError(
                f"ghs.sql: cannot parse COPY: {s[:80]!r} — use COPY "
                "INTO t FROM '/dir' [FILEFORMAT = PARQUET|CSV|JSON|ORC]")
        import hashlib

        from glue_hudi_spark.sources.batch import BookmarkedScan

        t = self._target(m.group("name"))
        fmt = (m.group("fmt") or "parquet").lower()
        token = hashlib.md5(
            f"{m.group('src')}|{fmt}".encode()).hexdigest()[:8]
        scan = BookmarkedScan(
            self.spark, m.group("src"),
            ledger_path=Path(t.root) / f"_copy_ledger_{token}.json",
            fmt=fmt)
        batch = scan.read_batch()
        report = "num_files_loaded int, num_rows_loaded bigint"
        if batch is None:
            return self.spark.createDataFrame([(0, 0)], report)
        missing = [k for k in t.record_keys if k not in batch.columns]
        if missing:
            raise ValueError(
                f"ghs.sql: COPY INTO source lacks record-key column(s) "
                f"{missing}")
        defaults = self._data_defaults(t)
        out = batch.select(*[
            (F.col(c).cast(typ) if c in batch.columns
             else F.lit(defaults.get(c)).cast(typ)).alias(c)
            for c, typ in self._data_types(t).items()])
        n_files = len(scan._pending)
        # persist so the batch's files are parsed ONCE for both the
        # row-count report and the write (num_rows_loaded = source rows
        # read, pre-precombine — the COPY INTO convention; with a
        # precombine column, in-batch duplicate keys land as one row)
        out = out.persist()
        try:
            n_rows = out.count()
            self._keyed_write(t, out)
        finally:
            out.unpersist()
        scan.commit()  # only after the table commit published
        self._after_write(m.group("name"))
        return self.spark.createDataFrame([(n_files, n_rows)], report)

    # ------------------------------------------------------------ RESTORE

    _RESTORE = re.compile(
        rf"^RESTORE\s+(?:TABLE\s+)?(?P<name>{_IDENT})\s+TO\s+"
        rf"(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
        rf"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']*)')"
        rf"\s*$", re.IGNORECASE)

    def _restore(self, s: str) -> None:
        """Delta's ``RESTORE TABLE t TO VERSION/TIMESTAMP AS OF``: the
        engine's non-destructive rollback — publishes a NEW manifest
        replaying the target commit's file set, so readers switch
        atomically, history stays queryable, and orphaned files age out
        through retention (no data deleted here)."""
        m = self._RESTORE.match(s)
        if not m:
            raise ValueError(
                f"ghs.sql: cannot parse RESTORE: {s[:80]!r} — use "
                "RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS "
                "OF 'ts'")
        t = self._target(m.group("name"))
        if m.group("ver") is not None:
            cid = int(m.group("ver"))
        else:
            commit = t.timeline.at_timestamp(m.group("ts"))
            if commit is None:
                raise ValueError(
                    f"ghs.sql: no retained commit at or before "
                    f"{m.group('ts')!r}")
            cid = commit.commit_id
        t.rollback(to_commit_id=cid)
        self._after_write(m.group("name"))
        return None

    _BOUND = re.compile(
        rf"^\s*(?P<col>{_IDENT})\s*(?P<op><=|>=|=|<|>)\s*(?P<rhs>.+?)\s*$",
        re.DOTALL)
    _BETWEEN_TERM = re.compile(
        rf"^\s*(?P<col>{_IDENT})\s+BETWEEN\s+(?P<a>.+)\s+AND\s+"
        rf"(?P<b>.+?)\s*$", re.IGNORECASE | re.DOTALL)
    _IN_TERM = re.compile(
        rf"^\s*(?P<col>{_IDENT})\s+IN\s*\((?P<body>.+)\)\s*$",
        re.IGNORECASE | re.DOTALL)

    @staticmethod
    def _has_toplevel_kw(text: str, kw: str) -> bool:
        """True when ``kw`` appears at paren depth 0 of the
        literal-masked ``text`` (a BETWEEN buried in function args must
        not trigger fragment merging)."""
        depth = 0
        for m in re.finditer(r"[()\[\]]|\b" + kw + r"\b",
                             _mask_literals(text), re.IGNORECASE):
            tok = m.group(0)
            if tok in "([":
                depth += 1
            elif tok in ")]":
                depth -= 1
            elif depth == 0:
                return True
        return False

    @classmethod
    def _merge_between_terms(cls, terms: list[str]) -> list[str]:
        """Re-join the two fragments a top-level ``col BETWEEN a AND b``
        becomes under the AND split, so the term loop can bound it. A
        merged term that still isn't a recognizable BETWEEN simply
        contributes no bound (sound — pruning only narrows)."""
        out, i = [], 0
        while i < len(terms):
            t = terms[i]
            if i + 1 < len(terms) and cls._has_toplevel_kw(t, "BETWEEN"):
                out.append(f"{t} AND {terms[i + 1]}")
                i += 2
            else:
                out.append(t)
                i += 1
        return out

    def _where_bounds(self, t: NativeTable,
                      where: str | None) -> dict | None:
        """Best-effort ``{col: (lo, hi)}`` bounds from a WHERE
        CONJUNCTION, for manifest-level file pruning (partition dirs +
        column-stats index) on DELETE/UPDATE. Pruning is an
        OPTIMIZATION, never a correctness dependency: any term or whole
        predicate this can't bound simply returns fewer/no bounds and
        the engine scans more files. Conservative by construction —
        OR/NOT anywhere disables it, a term only contributes
        when its left side is a table column, its right side evaluates
        as a constant (``SELECT rhs`` succeeds) and mentions no table
        column (guards columns shadowing SQL function names, e.g. a
        column literally named ``current_date``). Strict < / > use the
        inclusive bound — a slightly wider range, still sound.
        ``col BETWEEN a AND b`` bounds both sides (the AND-split
        fragments re-merge first); ``col IN (v1, ...)`` bounds
        [min(v), max(v)] when every list item is a constant.

        All keyword scans run on a literal-masked copy of the text
        (``_mask_literals``) and the AND split is quote/paren-aware —
        a string literal containing ``' AND seq = 5'`` must not parse
        as a conjunction term (it would yield a bogus bound and prune
        files that DO hold matching rows)."""
        if not where or re.search(r"\b(OR|NOT)\b",
                                  _mask_literals(where), re.IGNORECASE):
            return None
        cols = set(self._data_types(t))
        colpat = re.compile(
            r"\b(" + "|".join(re.escape(c) for c in sorted(cols)) + r")\b",
            re.IGNORECASE) if cols else None

        def const(expr: str):
            """expr's value when it is a column-free constant, else
            None (the column-mention guard runs on the literal-masked
            text: a column NAME inside a string constant is not a
            reference)."""
            if colpat and colpat.search(_mask_literals(expr)):
                return None
            try:
                return self.spark.sql(f"SELECT {expr}").first()[0]
            except Exception:
                return None  # not a constant — can't bound this term

        def narrow(col, lo_v, hi_v):
            lo, hi = bounds.get(col, (None, None))
            try:
                if lo_v is not None:
                    lo = lo_v if lo is None else max(lo, lo_v)
                if hi_v is not None:
                    hi = hi_v if hi is None else min(hi, hi_v)
            except TypeError:
                return  # mixed incomparable bounds — leave previous
            bounds[col] = (lo, hi)

        bounds: dict = {}
        for term in self._merge_between_terms(_split_and_top(where)):
            m = self._BOUND.match(term)
            if m and _unq(m.group("col")) in cols:
                val = const(m.group("rhs"))
                if val is None:
                    continue
                op = m.group("op")
                narrow(_unq(m.group("col")),
                       val if op in (">", ">=", "=") else None,
                       val if op in ("<", "<=", "=") else None)
                continue
            m = self._BETWEEN_TERM.match(term)
            if m and _unq(m.group("col")) in cols:
                a, b = const(m.group("a")), const(m.group("b"))
                if a is not None and b is not None:
                    narrow(_unq(m.group("col")), a, b)
                continue
            m = self._IN_TERM.match(term)
            if m and _unq(m.group("col")) in cols:
                vals = [const(item) for item in
                        _split_top(m.group("body"))]
                if vals and all(v is not None for v in vals):
                    try:
                        narrow(_unq(m.group("col")), min(vals), max(vals))
                    except TypeError:
                        pass  # mixed types in the list — skip
        return bounds or None

    def _data_defaults(self, t: NativeTable) -> dict[str, object]:
        head = t.timeline.latest()
        if head is None:
            return {}
        inv = {p: l for l, p in head.column_mapping.items()}
        return {inv.get(c, c): d["value"]
                for c, d in head.column_defaults.items()}

    def _data_types(self, t: NativeTable) -> dict[str, str]:
        import json as _json

        from glue_hudi_spark.storage.native import META_COLS

        head = t.timeline.latest()
        if head is None:
            raise ValueError(f"ghs.sql: table at {t.root} has no schema yet")
        sch = T.StructType.fromJson(_json.loads(head.schema_json))
        inv = {p: l for l, p in head.column_mapping.items()}
        retired = set(head.retired_cols)
        out = {}
        for f in sch.fields:
            if f.name in META_COLS or f.name in retired:
                continue
            out[inv.get(f.name, f.name)] = f.dataType.simpleString()
        # column defaults live in the manifest, not the stored schema
        for c, d in head.column_defaults.items():
            out.setdefault(inv.get(c, c), d.get("type", "string"))
        return out

    # ------------------------------------------------------------- UPDATE

    _UPDATE = re.compile(
        rf"^UPDATE\s+(?P<name>{_IDENT})\s+SET\s+(?P<sets>.+?)"
        rf"(?:\s+WHERE\s+(?P<where>.+))?$",
        re.IGNORECASE | re.DOTALL)

    def _update(self, s: str) -> None:
        m = self._UPDATE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse UPDATE: {s[:80]!r}")
        t = self._target(m.group("name"))
        assigns = {}
        for item in _split_top(m.group("sets")):
            k, _, v = item.partition("=")
            assigns[_unq(k.strip())] = v.strip()
        # guard the identity columns: a SET on a record key re-upserts
        # the row under the NEW key, so the old row would survive —
        # silent duplication, not an update (Hudi likewise forbids
        # record-key updates). Partition-column SETs relocate the row
        # only under a global index; without one they duplicate too.
        cols = set(self._data_types(t))
        unknown = sorted(set(assigns) - cols)
        if unknown:
            raise ValueError(
                f"ghs.sql: UPDATE SET references unknown column(s) "
                f"{unknown} — table columns are {sorted(cols)}")
        keyed = sorted(set(assigns) & set(t.record_keys))
        if keyed:
            raise ValueError(
                f"ghs.sql: UPDATE cannot SET record-key column(s) "
                f"{keyed} — the rewritten row would be upserted under "
                "the new key while the old row survives. DELETE + "
                "INSERT instead")
        if not t.global_index:
            parted = sorted(set(assigns)
                            & {f.source for f in t._pfields})
            if parted:
                raise ValueError(
                    f"ghs.sql: UPDATE cannot SET partition column(s) "
                    f"{parted} on a non-global-index table — the row "
                    "would be rewritten into the new partition while "
                    "the old-partition copy survives (enable "
                    "global_index for relocating updates)")
        cond = m.group("where") or "true"
        # manifest-level prune (partition dirs + stats index) BEFORE the
        # scan when the WHERE yields bounds; the rewrite side is pruned
        # by upsert's key-range/bloom ladder regardless
        snap = t.read_snapshot(
            prune=self._where_bounds(t, m.group("where"))
        ).filter(F.expr(cond))
        # SQL UPDATE: every RHS sees the OLD row — one simultaneous
        # projection, not a withColumn cascade
        out = snap.select(*[
            F.expr(assigns[c]).cast(dict(snap.dtypes)[c]).alias(c)
            if c in assigns else F.col(c)
            for c in snap.columns
        ])
        t.upsert(out)
        self._after_write(m.group("name"))
        return None

    # ------------------------------------------------------------- DELETE

    _DELETE = re.compile(
        rf"^DELETE\s+FROM\s+(?P<name>{_IDENT})"
        rf"(?:\s+WHERE\s+(?P<where>.+))?$",
        re.IGNORECASE | re.DOTALL)

    def _delete(self, s: str) -> None:
        m = self._DELETE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse DELETE: {s[:80]!r}")
        t = self._target(m.group("name"))
        t.delete_where(F.expr(m.group("where") or "true"),
                       prune=self._where_bounds(t, m.group("where")))
        self._after_write(m.group("name"))
        return None

    # ------------------------------------------------------------- MERGE

    _MERGE_HEAD = re.compile(
        rf"^MERGE\s+INTO\s+(?P<tgt>{_IDENT})(?:\s+AS)?\s+(?P<ta>{_IDENT})\s+"
        rf"USING\s+", re.IGNORECASE | re.DOTALL)
    _MERGE_TAIL = re.compile(
        rf"\s*(?:AS\s+)?(?P<sa>{_IDENT})\s+ON\s+(?P<on>.+?)\s+"
        rf"(?P<clauses>WHEN\s+.+)$", re.IGNORECASE | re.DOTALL)
    _WHEN = re.compile(
        r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
        r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
        r"(?P<act>UPDATE\s+SET\s+\*|UPDATE\s+SET\s+.+?|DELETE|INSERT\s+\*"
        r"|INSERT\s*\([^)]*\)\s*VALUES\s*\([^)]*\))"
        r"(?=\s+WHEN\s|\s*$)",
        re.IGNORECASE | re.DOTALL)

    def _merge(self, s: str) -> None:
        bad = ValueError(
            "ghs.sql: MERGE must be of the form MERGE INTO tgt t "
            "USING src s ON t.k = s.k WHEN [NOT] MATCHED [AND c] "
            "THEN UPDATE SET ... | DELETE | INSERT *")
        hm = self._MERGE_HEAD.match(s)
        if not hm:
            raise bad
        # the USING source: a (subquery) — balanced-paren scanned, since
        # expressions nest arbitrarily (CAST(x AS DECIMAL(10,2))) — or a
        # bare table/view name
        rest = s[hm.end():].lstrip()
        if rest.startswith("("):
            end = _balanced_end(rest)
            if end is None:
                raise bad
            srcref, rest = rest[:end], rest[end:]
        else:
            im = re.match(_IDENT, rest)
            if not im:
                raise bad
            srcref, rest = im.group(0), rest[im.end():]
        m = self._MERGE_TAIL.match(rest)
        if not m:
            raise bad
        t = self._target(hm.group("tgt"))
        ta, sa = _unq(hm.group("ta")), _unq(m.group("sa"))
        source = (self._query_df(srcref[1:-1])
                  if srcref.startswith("(") else self._view_df(srcref))

        def norm(expr: str | None) -> str | None:
            if expr is None:
                return None
            expr = re.sub(rf"\b{re.escape(ta)}\.", "tgt.", expr)
            return re.sub(rf"\b{re.escape(sa)}\.", "src.", expr)

        # the ON clause must be exactly the record-key equality
        # conjunction — merge_into matches on the table's keys by design
        on_keys = set()
        for term in re.split(r"\s+AND\s+", m.group("on"),
                             flags=re.IGNORECASE):
            em = re.match(
                rf"^\s*(?:{_IDENT})\.({_IDENT})\s*=\s*(?:{_IDENT})"
                rf"\.({_IDENT})\s*$", term)
            if not em or _unq(em.group(1)) != _unq(em.group(2)):
                raise ValueError(
                    f"ghs.sql: MERGE ON must be a conjunction of "
                    f"key equalities (t.k = s.k); got {term.strip()!r}")
            on_keys.add(_unq(em.group(1)))
        if on_keys != set(t.record_keys):
            raise ValueError(
                f"ghs.sql: MERGE ON keys {sorted(on_keys)} must equal the "
                f"table's record keys {sorted(t.record_keys)}")
        kw: dict = {"when_not_matched_insert": False}
        for wm in self._WHEN.finditer(m.group("clauses")):
            act = wm.group("act")
            actU = act.upper()
            if wm.group("bysrc"):
                # WHEN NOT MATCHED BY SOURCE: table rows absent from the
                # source — Delta's reconciliation clauses (tgt-only
                # expressions; merge_into widens the probe accordingly)
                if not wm.group("not"):
                    raise ValueError(
                        "ghs.sql: BY SOURCE requires NOT MATCHED")
                if actU == "DELETE":
                    kw["when_not_matched_by_source_delete"] = \
                        norm(wm.group("cond")) or True
                elif actU.startswith("UPDATE"):
                    body = re.sub(r"^UPDATE\s+SET\s+", "", act,
                                  flags=re.IGNORECASE).strip()
                    if body == "*":
                        raise ValueError(
                            "ghs.sql: BY SOURCE UPDATE needs explicit "
                            "SET assignments (there is no source row)")
                    kw["when_not_matched_by_source_update"] = {
                        _unq(k.strip()).split(".")[-1]: norm(v.strip())
                        for k, v in (item.partition("=")[::2]
                                     for item in _split_top(body))
                    }
                    kw["by_source_update_condition"] = norm(wm.group("cond"))
                else:
                    raise ValueError(
                        "ghs.sql: WHEN NOT MATCHED BY SOURCE supports "
                        "DELETE or UPDATE SET only")
                continue
            if wm.group("not"):
                if not actU.startswith("INSERT"):
                    raise ValueError(
                        "ghs.sql: WHEN NOT MATCHED supports INSERT only")
                if actU.replace(" ", "") != "INSERT*" and "VALUES" in actU:
                    raise ValueError(
                        "ghs.sql: WHEN NOT MATCHED THEN INSERT supports "
                        "INSERT * (column-list inserts: project the "
                        "USING source instead)")
                kw["when_not_matched_insert"] = True
                kw["insert_condition"] = norm(wm.group("cond"))
            elif actU == "DELETE":
                kw["when_matched_delete"] = norm(wm.group("cond")) or "true"
            else:  # UPDATE SET ...
                body = re.sub(r"^UPDATE\s+SET\s+", "", act,
                              flags=re.IGNORECASE).strip()
                if body == "*":
                    kw["when_matched_update"] = "*"
                else:
                    kw["when_matched_update"] = {
                        _unq(k.strip()).split(".")[-1]: norm(v.strip())
                        for k, v in (item.partition("=")[::2]
                                     for item in _split_top(body))
                    }
                kw["update_condition"] = norm(wm.group("cond"))
        t.merge_into(source, **kw)
        self._after_write(hm.group("tgt"))
        return None

    def _view_df(self, name: str) -> DataFrame:
        name = _unq(name)
        if name in self.tables:
            return self.tables[name].read_snapshot()
        return self.spark.table(name)

    # ------------------------------------------------------------- ALTER

    _ALTER_ADD = re.compile(
        rf"^ALTER\s+TABLE\s+(?P<name>{_IDENT})\s+ADD\s+COLUMNS?\s*"
        rf"\(?\s*(?P<col>{_IDENT})\s+(?P<type>[A-Za-z0-9_(),\s]+?)"
        rf"(?:\s+DEFAULT\s+(?P<def>.+?))?\s*\)?\s*$",
        re.IGNORECASE | re.DOTALL)

    _ALTER_RENAME = re.compile(
        rf"^ALTER\s+TABLE\s+(?P<name>{_IDENT})\s+RENAME\s+COLUMN\s+"
        rf"(?P<old>{_IDENT})\s+TO\s+(?P<new>{_IDENT})\s*$",
        re.IGNORECASE)
    _ALTER_DROP = re.compile(
        rf"^ALTER\s+TABLE\s+(?P<name>{_IDENT})\s+DROP\s+COLUMNS?\s*"
        rf"\(?\s*(?P<col>{_IDENT})\s*\)?\s*$", re.IGNORECASE)

    _ALTER_CONSTRAINT = re.compile(
        rf"^ALTER\s+TABLE\s+(?P<name>{_IDENT})\s+ADD\s+CONSTRAINT\s+"
        rf"(?:{_IDENT})\s+CHECK\s*\((?P<expr>.+)\)\s*$",
        re.IGNORECASE | re.DOTALL)

    def _alter(self, s: str) -> None:
        m = self._ALTER_CONSTRAINT.match(s)
        if m:
            # Delta semantics: EXISTING rows must already satisfy the
            # constraint (one aggregate over the snapshot; NULL passes —
            # SQL CHECK), then future writes enforce it at the write
            # chokepoint. Persisted so reopened handles keep enforcing.
            t = self._target(m.group("name"))
            expr = m.group("expr").strip()
            bad = t.read_snapshot().filter(
                ~F.coalesce(F.expr(expr), F.lit(True))).count()
            if bad:
                raise ValueError(
                    f"ghs.sql: cannot ADD CONSTRAINT ({expr}): {bad} "
                    "existing rows violate it")
            t.constraints.append(expr)
            t.save_properties()
            return None
        m = self._ALTER_RENAME.match(s)
        if m:
            self._target(m.group("name")).rename_column(
                _unq(m.group("old")), _unq(m.group("new")))
            self._after_write(m.group("name"))
            return None
        m = self._ALTER_DROP.match(s)
        if m:
            self._target(m.group("name")).drop_column(_unq(m.group("col")))
            self._after_write(m.group("name"))
            return None
        m = self._ALTER_ADD.match(s)
        if not m:
            raise ValueError(
                "ghs.sql: ALTER TABLE supports ADD COLUMN col type "
                "[DEFAULT expr], RENAME COLUMN old TO new, DROP COLUMN "
                "col (further maintenance: OPTIMIZE/VACUUM or the CLI)")
        t = self._target(m.group("name"))
        ctype = m.group("type").strip()
        default = None
        if m.group("def") is not None:
            default = self.spark.sql(
                f"SELECT CAST({m.group('def')} AS {ctype})").first()[0]
        t.add_column(_unq(m.group("col")), ctype, default=default)
        self._after_write(m.group("name"))
        return None

    # --------------------------------------- introspection / maintenance

    _TRUNCATE = re.compile(
        rf"^TRUNCATE\s+TABLE\s+(?P<name>{_IDENT})\s*$", re.IGNORECASE)

    def _truncate(self, s: str) -> None:
        m = self._TRUNCATE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse TRUNCATE: {s[:80]!r}")
        self._target(m.group("name")).delete_where(F.expr("true"))
        self._after_write(m.group("name"))
        return None

    _SHOW_CREATE = re.compile(
        rf"^SHOW\s+CREATE\s+TABLE\s+(?P<name>{_IDENT})\s*$", re.IGNORECASE)

    _SHOW_PARTITIONS = re.compile(
        rf"^SHOW\s+PARTITIONS\s+(?P<name>{_IDENT})\s*$", re.IGNORECASE)

    def _show(self, s: str) -> DataFrame:
        cm = self._SHOW_CREATE.match(s)
        if cm:
            return self._show_create(_unq(cm.group("name")))
        sim = self._SHOW_INDEXES.match(s)
        if sim:
            return self._show_indexes(sim.group("name"))
        pm = self._SHOW_PARTITIONS.match(s)
        if pm:
            # metadata-only: partition tuples come from the manifest's
            # file paths — no file is listed or opened (at 100 TB,
            # SHOW PARTITIONS must not touch data)
            t = self._table(pm.group("name"))
            if not t.partition_keys:
                raise ValueError(
                    f"ghs.sql: table {_unq(pm.group('name'))!r} is not "
                    "partitioned")
            # delegate to the Iceberg-style metadata table — ONE
            # implementation of the manifest partition walk
            names = [f.name for f in t._pfields]
            return t.metadata_table("partitions").select(
                F.concat_ws("/", *[
                    F.concat_ws("=", F.lit(n), F.col("partition")[n])
                    for n in names]).alias("partition")
            ).orderBy("partition")
        tp = re.match(rf"^SHOW\s+TBLPROPERTIES\s+(?P<name>{_IDENT})\s*$",
                      s, re.IGNORECASE)
        if tp:
            t = self._table(tp.group("name"))
            rows = sorted(self._table_props(t).items())
            return self.spark.createDataFrame(
                rows, "key string, value string")
        if re.match(r"^SHOW\s+VIEWS\s*$", s, re.IGNORECASE):
            return self.spark.createDataFrame(
                [(n,) for n in sorted(self.views)] or [],
                "viewName string")
        if re.match(r"^SHOW\s+MATERIALIZED\s+VIEWS\s*$", s, re.IGNORECASE):
            rows = []
            for n in sorted(self.mviews):
                spec = self._mv_specs[n]
                bases = ([spec["base"]] if spec["kind"] == "agg"
                         else [spec["fact"], spec["dim"]])
                rows.append((n, spec["kind"], ",".join(bases),
                             bool(spec.get("auto"))))
            return self.spark.createDataFrame(
                rows or [], "name string, kind string, bases string, "
                            "auto_refresh boolean")
        if not re.match(r"^SHOW\s+TABLES\s*$", s, re.IGNORECASE):
            raise ValueError(
                "ghs.sql: SHOW supports SHOW TABLES, SHOW VIEWS, SHOW "
                "MATERIALIZED VIEWS, SHOW PARTITIONS t, SHOW "
                "TBLPROPERTIES t, and SHOW CREATE TABLE t")
        return self.spark.createDataFrame(
            [(n,) for n in sorted(self.tables)] or [],
            "tableName string")

    @staticmethod
    def _sql_literal(v: object) -> str:
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return str(v)
        # strings, and anything else (dates, decimals) via its string
        # form — the consumer always CASTs to the declared column type
        s = str(v)
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    @staticmethod
    def _table_props(t: NativeTable) -> dict[str, str]:
        """The Hudi-convention TBLPROPERTIES payload for a table handle
        (shared by SHOW CREATE TABLE and SHOW TBLPROPERTIES)."""
        props = {"primaryKey": ",".join(t.record_keys)}
        if t.precombine:
            props["preCombineField"] = t.precombine
        props["type"] = t.storage_type
        if t.stats_cols:
            props["statsCols"] = ",".join(t.stats_cols)
        if t.sort_order:
            props["sortOrder"] = ",".join(t.sort_order)
        if t.bloom_index:
            props["bloomIndex"] = "true"
        if t.files_per_partition:
            props["filesPerPartition"] = str(t.files_per_partition)
        return props

    def _show_create(self, name: str) -> DataFrame:
        """Delta's ``SHOW CREATE TABLE``: a statement this dispatcher
        itself re-executes to an equivalent table (round-trip pinned in
        tests). Emitted from the live handle + manifest (current logical
        schema, declared defaults), not the original text — renames and
        ADD/DROP COLUMN are reflected. LOCATION only for EXTERNAL roots:
        a warehouse-managed table re-created elsewhere must land in the
        new warehouse, not point back at the old files. A materialized
        view emits its recorded CREATE MATERIALIZED VIEW statement."""
        if name in self.views:
            return self.spark.createDataFrame(
                [(f"CREATE VIEW {name}\nAS {self.views[name]}",)],
                "createtab_stmt string")
        if name in self.mviews:
            spec = self._mv_specs[name]
            props = {}
            if spec.get("cluster_by"):
                props["clusterBy"] = spec["cluster_by"]
            if spec.get("dim_cols"):
                props["dimCols"] = ",".join(spec["dim_cols"])
            if spec.get("auto"):
                props["refresh"] = "auto"
            elif spec.get("every"):
                props["refresh"] = f"commit:{spec['every']}"
            stmt = f"CREATE MATERIALIZED VIEW {name}"
            if props:
                stmt += "\nTBLPROPERTIES (" + ", ".join(
                    f"'{k}'='{v}'" for k, v in props.items()) + ")"
            stmt += f"\nAS {spec['query']}"
            return self.spark.createDataFrame(
                [(stmt,)], "createtab_stmt string")
        t = self._table(name)
        defaults = self._data_defaults(t)
        cols = []
        for c, typ in self._data_types(t).items():
            d = (f" DEFAULT {self._sql_literal(defaults[c])}"
                 if defaults.get(c) is not None else "")
            cols.append(f"{c} {typ}{d}")
        props = self._table_props(t)
        stmt = f"CREATE TABLE {name} (\n  " + ",\n  ".join(cols) + \
            "\n) USING ghs_table"
        if t.partition_keys:
            stmt += f"\nPARTITIONED BY ({', '.join(t.partition_keys)})"
        try:
            external = not Path(t.root).resolve().is_relative_to(
                self.warehouse.resolve())
        except (OSError, ValueError):
            external = True
        if external:
            stmt += f"\nLOCATION '{t.root}'"
        stmt += "\nTBLPROPERTIES (" + ", ".join(
            f"'{k}'='{v}'" for k, v in props.items()) + ")"
        return self.spark.createDataFrame(
            [(stmt,)], "createtab_stmt string")

    _DESCRIBE_HISTORY = re.compile(
        rf"^DESC(?:RIBE)?\s+HISTORY\s+(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)
    _DESCRIBE_DETAIL = re.compile(
        rf"^DESC(?:RIBE)?\s+DETAIL\s+(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)
    _DESCRIBE = re.compile(
        rf"^DESC(?:RIBE)?\s+(?:TABLE\s+)?(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)

    def _describe_detail(self, name: str) -> DataFrame:
        """Delta's ``DESCRIBE DETAIL``: one row of physical table facts
        from the head manifest + the durable ``_table.json`` config —
        O(manifest), no file is opened."""
        t = self._table(name)
        head = t.timeline.latest()
        files = list(head.files) if head else []
        n_deltas = sum(len(d["files"]) for d in head.deltas) if head else 0
        size = (sum(head.file_sizes.get(f, 0) for f in files)
                if head else 0)
        rows = (sum(head.row_counts.get(f, 0) for f in files)
                if head else 0)
        props = {k: getattr(t, k) for k in
                 ("stats_cols", "bloom_index", "global_index",
                  "deletion_vectors", "strict_schema",
                  "change_feed_deletes", "sort_order", "constraints")
                 if getattr(t, k)}
        return self.spark.createDataFrame(
            [(
                "ghs_table", str(t.root), t.storage_type,
                list(t.record_keys), t.precombine,
                list(t.partition_keys),
                len(files), n_deltas, int(size), int(rows),
                head.commit_id if head else None,
                len(t.timeline.history()),
                json.dumps(props, sort_keys=True, default=str),
            )],
            "format string, location string, storage_type string, "
            "record_keys array<string>, precombine string, "
            "partition_keys array<string>, num_files int, "
            "num_delta_files int, size_bytes long, num_rows long, "
            "head_commit long, num_commits int, properties string")

    def _describe(self, s: str) -> DataFrame:
        dm = self._DESCRIBE_DETAIL.match(s)
        if dm:
            return self._describe_detail(_unq(dm.group("name")))
        hm = self._DESCRIBE_HISTORY.match(s)
        if hm:
            # Delta's DESCRIBE HISTORY: the commit timeline, newest first
            t = self._table(hm.group("name"))
            rows = [(c.commit_id, c.action,
                     float(c.wall_time), len(c.files),
                     json.dumps(c.stats, sort_keys=True, default=str))
                    for c in reversed(t.timeline.history())]
            return self.spark.createDataFrame(
                rows, "version long, operation string, timestamp double, "
                      "n_files int, stats string")
        m = self._DESCRIBE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse DESCRIBE: {s[:80]!r}")
        t = self._table(m.group("name"))
        rows = [(c, typ, "") for c, typ in self._data_types(t).items()]
        rows += [("# record_keys", ",".join(t.record_keys), ""),
                 ("# partition_keys", ",".join(t.partition_keys), ""),
                 ("# storage_type", t.storage_type, ""),
                 ("# location", str(t.root), "")]
        return self.spark.createDataFrame(
            rows, "col_name string, data_type string, comment string")

    _ANALYZE = re.compile(
        rf"^ANALYZE\s+TABLE\s+(?P<name>{_IDENT})\s+COMPUTE\s+STATISTICS"
        rf"(?:\s+FOR\s+(?:(?P<all>ALL\s+COLUMNS)|COLUMNS\s+(?P<cols>.+?)))?"
        rf"\s*$",
        re.IGNORECASE | re.DOTALL)

    def _analyze(self, s: str) -> DataFrame:
        """Spark's ``ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c, …
        | FOR ALL COLUMNS]`` bound to :meth:`NativeTable.analyze`: ONE
        aggregate pass over one snapshot scan computes row count plus
        per-column NDV (HLL++), null count and min/max, persisted to
        ``_stats/analyze.json`` stamped with the commit id it describes —
        the planner-facing statistics a broadcast/bucketing/skew decision
        reads without touching data again. Unlike Spark's statement this
        RETURNS the stats (one row per analyzed column; the bare form
        returns the row count only), so a SQL session can inspect what it
        just computed. Allowed inside a transaction: the sidecar is
        derived, advisory state outside the commit protocol."""
        m = self._ANALYZE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse ANALYZE: {s[:80]!r}")
        t = self._table(m.group("name"))
        if m.group("all"):
            cols = None
        elif m.group("cols"):
            cols = [_unq(c.strip())
                    for c in _split_top(m.group("cols")) if c.strip()]
            known = set(self._data_types(t))
            missing = [c for c in cols if c not in known]
            if missing:
                raise ValueError(
                    f"ghs.sql: ANALYZE columns not in "
                    f"{_unq(m.group('name'))!r}: {missing}")
        else:
            cols = []
        out = t.analyze(cols)
        rows = [(c, st["ndv_est"], st["null_count"], st["min"], st["max"],
                 out["row_count"], out["as_of_commit"])
                for c, st in out["columns"].items()]
        if not rows:
            rows = [(None, None, None, None, None,
                     out["row_count"], out["as_of_commit"])]
        return self.spark.createDataFrame(
            rows, "column string, ndv_est long, null_count long, "
                  "min string, max string, row_count long, "
                  "as_of_commit long")

    _CACHE = re.compile(
        rf"^CACHE\s+(?P<lazy>LAZY\s+)?TABLE\s+(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)
    _UNCACHE = re.compile(
        rf"^UNCACHE\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)

    def _cache_table(self, s: str) -> None:
        """Spark's ``CACHE [LAZY] TABLE``: pin the CURRENT snapshot in
        executor memory and bind the view to the pinned frame — repeated
        reads skip the scan entirely. Session-scoped (Spark semantics);
        any write that moves the table's head releases the pin via
        ``_with_views`` rather than serving the pre-write snapshot. The
        default is EAGER (Spark parity): the pin materializes now, not
        on first read."""
        m = self._CACHE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse CACHE: {s[:80]!r} — "
                             "use CACHE [LAZY] TABLE name")
        name = _unq(m.group("name"))
        t = self._table(name)
        head = t.timeline.latest()
        if head is None:
            raise ValueError(f"ghs.sql: table {name!r} has no commits — "
                             "nothing to cache")
        self._release_cache(name)
        df = t.read_snapshot().persist()
        if not m.group("lazy"):
            df.count()
        df.createOrReplaceTempView(name)
        self._view_cache[name] = (head.commit_id, head.wall_time)
        self._cached[name] = df
        return None

    def _uncache_table(self, s: str) -> None:
        m = self._UNCACHE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse UNCACHE: {s[:80]!r}")
        name = _unq(m.group("name"))
        if name not in self.tables and re.search(
                r"IF\s+EXISTS", s, re.IGNORECASE):
            return None  # Spark parity: IF EXISTS makes it a no-op
        self._table(name)  # unknown table still raises (Spark parity)
        if name in self._cached:
            self._release_cache(name)
            # rebind the plain snapshot view at the next statement
            self._view_cache.pop(name, None)
        return None

    _OPTIMIZE = re.compile(
        rf"^OPTIMIZE\s+(?P<name>{_IDENT})"
        rf"(?:\s+WHERE\s+(?P<where>.+?))?"
        rf"(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]*)\))?\s*$",
        re.IGNORECASE | re.DOTALL)

    def _optimize(self, s: str) -> None:
        """Delta's OPTIMIZE surface: plain → bin-pack small files;
        WHERE <bounds> → scope the pack to matching files (at 100 TB a
        maintenance pass is scheduled per partition slice, never
        all-or-nothing); ZORDER BY (cols) → cluster on the interleaved
        key. WHERE must derive manifest bounds — a predicate the bound
        extractor can't prove raises rather than silently packing the
        whole table."""
        m = self._OPTIMIZE.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse OPTIMIZE: {s[:80]!r}")
        t = self._target(m.group("name"))
        prune = None
        if m.group("where"):
            if m.group("cols"):
                raise ValueError(
                    "ghs.sql: OPTIMIZE ... WHERE scopes bin-packing "
                    "only — ZORDER rewrites the whole table (drop the "
                    "WHERE, or bin-pack the slice first)")
            prune = self._where_bounds(t, m.group("where"))
            if prune is None:
                raise ValueError(
                    f"ghs.sql: OPTIMIZE WHERE {m.group('where')!r} "
                    "derives no manifest bounds (use simple range/"
                    "equality conjunctions on partition or stats "
                    "columns) — refusing to silently pack everything")
        if m.group("cols"):
            t.cluster(zorder_by=[_unq(c.strip())
                                 for c in m.group("cols").split(",")])
        else:
            t.bin_pack(prune=prune)
        return None

    _VACUUM = re.compile(
        rf"^VACUUM\s+(?P<name>{_IDENT})(?:\s+(?P<dry>DRY\s+RUN))?\s*$",
        re.IGNORECASE)

    def _vacuum(self, s: str) -> DataFrame | None:
        m = self._VACUUM.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse VACUUM: {s[:80]!r}")
        if m.group("dry"):
            # Delta's VACUUM ... DRY RUN: list what a real run would
            # reclaim (same selection incl. the in-flight threshold),
            # delete nothing — which also makes it transaction-safe,
            # though for symmetry with VACUUM it stays rejected in-txn
            rep = self._table(m.group("name")).vacuum(dry_run=True)
            rows = ([("data", f) for f in rep["deleted_files"]]
                    + [("bloom", f) for f in rep["deleted_blooms"]]
                    + [("dv", f) for f in rep["deleted_dvs"]]
                    + [("inflight_skipped", f)
                       for f in rep["skipped_inflight"]])
            return self.spark.createDataFrame(
                rows or [], "kind string, path string")
        self._table(m.group("name")).vacuum()
        return None

    # ------------------------------------------------------------- DROP

    _DROP = re.compile(
        rf"^DROP\s+(?P<kind>TABLE|MATERIALIZED\s+VIEW|VIEW)\s+"
        rf"(?:IF\s+EXISTS\s+)?(?P<name>{_IDENT})\s*$",
        re.IGNORECASE)

    def _mv_dependents(self, name: str) -> list[str]:
        out = []
        for mv, spec in self._mv_specs.items():
            bases = ([spec.get("base")] if spec["kind"] == "agg"
                     else [spec.get("fact"), spec.get("dim")])
            if name in bases:
                out.append(mv)
        return sorted(out)

    def _view_dependents(self, name: str) -> list[str]:
        """Stored views whose TEXT references ``name`` (word-boundary,
        literal-masked — conservative: a same-named column reads as a
        dependency, which can only over-protect a DROP)."""
        return sorted(v for v, q in self.views.items()
                      if v != name and self._mentions(q, {name}))

    def _drop(self, s: str) -> None:
        dim = self._DROP_INDEX.match(s)
        if dim:
            return self._drop_index(dim)
        m = self._DROP.match(s)
        if not m:
            raise ValueError(f"ghs.sql: cannot parse DROP: {s[:80]!r}")
        name = _unq(m.group("name"))
        kind = m.group("kind").upper()
        if kind == "VIEW":
            if name not in self.views:
                if re.search(r"IF\s+EXISTS", s, re.IGNORECASE):
                    return None
                raise ValueError(
                    f"ghs.sql: unknown view {name!r}"
                    + (" — use DROP MATERIALIZED VIEW"
                       if name in self.mviews else ""))
            vdeps = self._view_dependents(name)
            if vdeps:
                raise ValueError(
                    f"ghs.sql: view {name!r} is referenced by stored "
                    f"view(s) {vdeps} — DROP VIEW them first")
            del self.views[name]
            self._save_views()
            self.spark.catalog.dropTempView(name)
            return None
        is_mv_stmt = kind != "TABLE"
        if name in self.views:
            raise ValueError(
                f"ghs.sql: {name!r} is a stored view — use DROP VIEW")
        if name not in self.tables:
            if re.search(r"IF\s+EXISTS", s, re.IGNORECASE):
                return None
            raise ValueError(f"ghs.sql: unknown table {name!r}")
        if is_mv_stmt != (name in self.mviews):
            raise ValueError(
                f"ghs.sql: {name!r} is a "
                f"{'materialized view' if name in self.mviews else 'table'}"
                f" — use DROP "
                f"{'MATERIALIZED VIEW' if name in self.mviews else 'TABLE'}"
                f" {name}")
        deps = self._mv_dependents(name)
        if deps:
            raise ValueError(
                f"ghs.sql: table {name!r} has dependent materialized "
                f"view(s) {deps} — DROP MATERIALIZED VIEW them first")
        vdeps = self._view_dependents(name)
        if vdeps:
            raise ValueError(
                f"ghs.sql: {name!r} is referenced by stored view(s) "
                f"{vdeps} — DROP VIEW them first (dropping the base "
                "would leave every later statement failing at the "
                "view's replan)")
        import shutil

        t = self.tables.pop(name)
        self.mviews.pop(name, None)
        self._mv_specs.pop(name, None)
        self._view_cache.pop(name, None)
        self._release_cache(name)
        try:
            managed = Path(t.root).resolve().is_relative_to(
                self.warehouse.resolve())
        except (OSError, ValueError):
            managed = False
        if managed:
            shutil.rmtree(t.root, ignore_errors=True)
        # LOCATION-pinned tables are EXTERNAL (Delta/Iceberg/Hive
        # semantics): DROP deregisters but leaves the data — a later
        # NativeTable.open() can reattach. Only warehouse-managed roots
        # are deleted.
        # unconditional: catalog.listTables() lowercases names, so a
        # cased-name comparison left stale views alive (round-10 advice)
        self.spark.catalog.dropTempView(name)
        return None
