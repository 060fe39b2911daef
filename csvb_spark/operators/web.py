"""Web-provenance operators: URL canonicalization and per-domain
quotas.

Beyond-reference training-data-pipeline components (the reference has
no web semantics; SURVEY.md §2 notes the relational-only surface).
Crawl-derived corpora carry a URL per document, and two curation steps
lean on it everywhere:

- ``url_normalize`` / ``registered_domain``: pure Column expressions
  (regexp chains — JVM-side, whole-stage-codegen, zero shuffle) that
  canonicalize a URL the way crawl dedup does before hashing it:
  lowercase scheme+host, drop the fragment, drop default ports, strip
  a leading ``www.``, remove tracking query parameters
  (``utm_*``/``fbclid``/``gclid``/``ref``), and strip one trailing
  slash. Two fetches of the same page then hash equal. The regexes
  stay inside the RE2-compatible subset (no lookbehind) so any other
  engine can replay the canonicalization for audit.
- ``domain_quota_sample``: keep at most ``quota`` documents per
  registered domain, picked by a deterministic per-document priority —
  the anti-monoculture cap every crawl pipeline applies so one giant
  host cannot dominate the corpus. The priority is a pure-arithmetic
  Knuth multiplicative hash of ``doc_id`` (replayable in ANSI SQL, so
  the selection is auditable off-cluster), never ``rand()``.

Scale shape of the quota: a naive ``row_number() OVER (PARTITION BY
domain)`` sends EVERY row of a hot domain to one reducer — a
wikipedia.org at 100 TB is a straggler by construction. The operator
runs two phases: phase 1 ranks within ``(domain, doc_id % n_shards)``
and keeps ``quota`` per shard (parallelism ``n_domains × n_shards``,
reducer input bounded by the shard's rows); phase 2 re-ranks the
surviving ``≤ quota × n_shards`` candidates per domain. Any row in the
global per-domain top-``quota`` is also in its shard's top-``quota``,
so the two-phase result is EXACTLY the single-window result — the
shards change the plan, never the output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Second-level public suffixes the registered-domain heuristic keeps
# three labels for (a tiny embedded slice of the public-suffix list —
# same approach as text.py's embedded stopword lists).
SECOND_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "com.au",
    "co.jp",
    "com.br",
    "co.in",
)

# Query parameters that carry tracking state, not content identity.
TRACKING_PARAMS_RE = r"(?:utm_[a-z]+|fbclid|gclid|ref)"


def url_normalize(col: str | Column) -> Column:
    """Canonical URL form (see module doc for the rule list).

    The chain is order-sensitive: the fragment must go before the
    query-parameter rules (so ``?utm_x=1#f`` reduces cleanly), and the
    trailing-slash strip runs last (so ``/path/?utm_x=1`` ends
    ``/path``). Each step is one ``regexp_replace``/``regexp_extract``
    over the row — no UDF, no shuffle.
    """
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    # default ports are identity-free; a leading www. likewise
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host))
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    # tracking params: an interior RUN keeps its leading delimiter and
    # takes every trailing '&' (the + quantifier eats consecutive
    # params in one match — a second scan would miss them, since
    # replacement text is never rescanned); a trailing run then takes
    # its leading '?'/'&'. Anchoring each param to a [?&] delimiter
    # keeps 'ref=' inside a VALUE ('?id=xref=9') untouched.
    rest = F.regexp_replace(
        rest, r"([?&])(?:" + TRACKING_PARAMS_RE + r"=[^&#]*&)+", r"$1"
    )
    rest = F.regexp_replace(
        rest, r"(?:[?&]" + TRACKING_PARAMS_RE + r"=[^&#]*)+$", ""
    )
    # strip ONE path-final slash, whether the path ends the URL or a
    # query follows; anchored so a '/' inside a query value survives
    # (an unmatched optional group substitutes empty in both Java and
    # RE2 rewrites)
    rest = F.regexp_replace(rest, r"^([^?#]*)/(\?.*)?$", r"$1$2")
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )


def registered_domain(host_or_url: str | Column) -> Column:
    """The registrable domain of a host (or of a normalized URL —
    anything before the first ``/`` after ``://`` is taken as host):
    the last two labels, or three when the suffix is a known
    second-level public suffix (``a.b.co.uk`` → ``b.co.uk``). One
    regexp_extract; the specific-suffix branch is listed first so both
    RE2 and Java regex pick it at the earliest start.
    """
    c = F.col(host_or_url) if isinstance(host_or_url, str) else host_or_url
    host = F.when(
        c.rlike("://"), F.regexp_extract(c, r"://([^/?#]*)", 1)
    ).otherwise(c)
    host = F.regexp_replace(F.lower(host), r":[0-9]+$", "")
    alts = "|".join(s.replace(".", r"\.") for s in SECOND_LEVEL_SUFFIXES)
    return F.regexp_extract(
        host, r"([^.]+\.(?:" + alts + r")|[^.]+\.[^.]+)$", 1
    )


def quota_priority(id_col: str | Column) -> Column:
    """Deterministic pseudo-uniform priority in [0, 2^32): Knuth's
    multiplicative hash ``(id * 2654435761) mod 2^32`` — pure int64
    arithmetic (no overflow for ids below ~3.5e9), so ANSI SQL replays
    the exact selection. Requires non-negative ids (``%`` is
    sign-following in both Spark and DuckDB — the media synthesizers'
    precondition, enforced the same way by the caller's query entry).
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    # NULL ids would rank NULLS FIRST in the batch window but NaN-last
    # after Arrow hands them to the streaming gate — fail fast instead
    # of silently diverging (and instead of the gate's opaque
    # cannot-convert-NaN crash)
    return F.when(
        c.isNull(),
        F.assert_true(c.isNotNull(), F.lit("quota_priority: NULL id")).cast(
            "bigint"
        ),
    ).otherwise(F.pmod(c * F.lit(2654435761), F.lit(4294967296)))


def domain_quota_sample(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quota: int = 10,
    n_shards: int = 32,
) -> DataFrame:
    """Keep at most ``quota`` documents per registered domain of the
    NORMALIZED url, picked by ascending :func:`quota_priority` (ties
    impossible: ``id_col`` breaks them and is unique). Output one row
    per kept document: ``(doc_id, url_norm, domain, pick_rank)`` with
    ``pick_rank`` in [1, quota] — rank 1 is the domain's first keeper,
    so downstream budget cuts can tighten the quota without
    re-running the sample.

    Two-phase ranking (see module doc): phase 1 bounds every reducer
    to one ``(domain, id-shard)`` slice and keeps ``quota`` rows from
    it; phase 2 ranks ``≤ quota × n_shards`` survivors per domain —
    output provably identical to the single-window form the oracle
    replays.
    """
    if quota < 1:
        raise ValueError(f"domain_quota_sample: quota must be >= 1, got {quota}")
    if n_shards < 1:
        raise ValueError(
            f"domain_quota_sample: n_shards must be >= 1, got {n_shards}"
        )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        url_normalize(url_col).alias("url_norm"),
    ).withColumn("domain", registered_domain(F.col("url_norm")))
    base = base.withColumn("_prio", quota_priority("doc_id"))
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards))
    w1 = Window.partitionBy("domain", shard).orderBy("_prio", "doc_id")
    cands = base.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= quota
    )
    w2 = Window.partitionBy("domain").orderBy("_prio", "doc_id")
    return (
        cands.withColumn("pick_rank", F.row_number().over(w2))
        .filter(F.col("pick_rank") <= quota)
        .select("doc_id", "url_norm", "domain", "pick_rank")
    )


def extract_links(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Outbound-link extraction from HTML-ish document text — the step
    that turns a crawl into a LINK GRAPH (hosts per document feed
    :func:`~csvb_spark.operators.graph.pagerank` / per-domain quotas /
    spam-neighborhood analysis). Output per input doc: ``(doc_id,
    n_links, hosts)`` with ``hosts`` the sorted comma-joined distinct
    lowercased link hosts (NULL when the doc has no links).

    Pure per-row regex + array work — map-only, zero shuffles,
    whole-stage codegen; patterns stay inside the RE2-compatible
    subset (no backreferences/lookaround) so any engine can replay
    the extraction. Reference scope: beyond-reference
    (training-pipeline extension).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    urls = F.regexp_extract_all(text, F.lit(r'(?i)href="([^"]+)"'), F.lit(1))
    hosts = F.array_sort(
        F.array_distinct(
            F.transform(
                urls,
                lambda u: F.lower(
                    F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
                ),
            )
        )
    )
    # non-absolute hrefs extract '' — drop them from the host list
    hosts = F.filter(hosts, lambda h: h != F.lit(""))
    return docs.select(
        "doc_id",
        F.size(urls).alias("n_links"),
        F.when(F.size(hosts) > 0, F.array_join(hosts, ",")).alias("hosts"),
    )


# (pattern, replacement) chain shared conceptually with the oracle —
# ORDER MATTERS: script/style blocks before generic tags (their bodies
# may contain '<'); BLOCK-boundary tags become newlines BEFORE the
# generic tag rule eats them, so line structure survives for the C4
# line rules downstream (clean --html composes exactly this way);
# entity decode after tag removal; '&amp;' LAST so double-encoded
# entities do not double-decode; whitespace collapse keeps newlines.
HTML_STRIP_RULES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?is)<(?:br|/p|/div|/h[1-6]|/li|/tr|/ul|/ol|/table)[^>]*>", "\n"),
    (r"(?s)<[^>]+>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"[^\S\n]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n+", "\n"),
    (r"^\n", ""),
    (r"\n$", ""),
)


def html_strip(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Boilerplate-free TEXT from HTML-ish documents — the extraction
    step between the crawl and every text operator in this package
    (quality scoring a page with its markup counts tags as words and
    scripts as prose). Removes script/style/comment blocks, then tags,
    decodes the five core entities, and collapses whitespace. Output:
    ``(doc_id, clean_text, n_chars_clean)``.

    A regexp-replace CHAIN (``HTML_STRIP_RULES``, order documented
    there), entirely map-side and RE2-compatible — no backreferences
    (RE2 has none, so ``<(script|style)>.*?</\\1>`` is spelled as two
    rules), no lookaround. This is deliberately a lightweight
    extractor, not a DOM parser: the trafilatura-class readability
    heuristics live out of scope, but the plumbing (schema, map-only
    plan, oracle replay) is the real contract. Reference scope:
    beyond-reference (training-pipeline extension).
    """
    clean = html_strip_col(F.col(text_col))
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.length(clean).alias("n_chars_clean"),
    )


def html_strip_col(col: Column) -> Column:
    """The :func:`html_strip` rule chain as a plain Column expression —
    for callers that strip markup IN PLACE before downstream text
    operators (e.g. ``clean --html`` runs this ahead of the C4 line
    rules, the real pipeline order: markup out, then prose rules)."""
    clean = F.coalesce(col, F.lit(""))
    for pat, repl in HTML_STRIP_RULES:
        clean = F.regexp_replace(clean, pat, repl)
    return F.trim(clean)
