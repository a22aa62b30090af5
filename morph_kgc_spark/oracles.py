"""DuckDB oracle SQL twins for every Spark query in __spark_entry__.

Each generator returns ANSI-ish DuckDB SQL that reproduces the Spark
query's result *bit-for-bit* (the driver compares order-insensitive value
hashes). Shared numeric constants come from functions/hashing.py and
operators/text.py so both engines are generated from one definition point.

Portability rules baked in here:
- hashes are md5-derived: Spark ``conv(substr(md5(x),1,15),16,10)`` ==
  DuckDB ``CAST('0x'||substr(md5(x),1,15) AS UBIGINT)``;
- float work is cast to DOUBLE and summed in list-index order
  (list_transform/list_sum vs F.transform/F.aggregate), then rounded;
- integer arithmetic stays below 2^62 (P31 modulus) in both engines.
"""

from __future__ import annotations

from morph_kgc_spark.functions.hashing import (
    LSH_BANDS,
    LSH_ROWS,
    N_PERMS,
    P31,
    h64_sql,
    perm_sql,
)
from morph_kgc_spark.operators.text import LANG_PROFILES

EX = "http://example.com/"
FOAF_NAME = "http://xmlns.com/foaf/0.1/name"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

# ---------------------------------------------------------------------------
# KG-construction oracles
# ---------------------------------------------------------------------------


def kg_customer_triples() -> str:
    """Template subject + constant predicate + literal object (RMLTC0001a
    shape). The subject template embeds c_name, whose '#' must be
    percent-encoded in IRI position; the literal object stays raw."""
    return f"""
SELECT DISTINCT
  '<{EX}customer/' || replace(c_name, '#', '%23') || '>' AS subject,
  '<{FOAF_NAME}>' AS predicate,
  '"' || c_name || '"' AS object
FROM customer
"""


def kg_rdf_type() -> str:
    return f"""
SELECT DISTINCT
  '<{EX}supplier/' || CAST(s_suppkey AS VARCHAR) || '>' AS subject,
  '<{RDF_TYPE}>' AS predicate,
  '<{EX}Supplier>' AS object
FROM supplier
"""


def kg_typed_literals() -> str:
    """xsd:decimal via DECIMAL(12,2) cast; xsd:dateTime with ' '→'T'."""
    return f"""
SELECT DISTINCT subject, predicate, object FROM (
  SELECT
    '<{EX}order/' || CAST(o_orderkey AS VARCHAR) || '>' AS subject,
    '<{EX}totalPrice>' AS predicate,
    '"' || CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR)
        || '"^^<{XSD}decimal>' AS object
  FROM orders
  UNION ALL
  SELECT
    '<{EX}order/' || CAST(o_orderkey AS VARCHAR) || '>' AS subject,
    '<{EX}orderDate>' AS predicate,
    '"' || replace(CAST(o_orderdate AS VARCHAR), ' ', 'T')
        || '"^^<{XSD}dateTime>' AS object
  FROM orders
)
"""


def kg_join_customer_nation() -> str:
    """Referencing object map with joinCondition (R2RMLTC0009a shape)."""
    return f"""
SELECT DISTINCT
  '<{EX}customer/' || CAST(c_custkey AS VARCHAR) || '>' AS subject,
  '<{EX}nation>' AS predicate,
  '<{EX}nation/' || n_name || '>' AS object
FROM customer JOIN nation ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
"""


def kg_language_tags() -> str:
    return f"""
SELECT DISTINCT
  '<{EX}doc/' || CAST(doc_id AS VARCHAR) || '>' AS subject,
  '<{EX}text>' AS predicate,
  '"' || replace(replace(text, chr(92), chr(92)||chr(92)), '"', chr(92)||'"')
      || '"@' || lang AS object
FROM documents
"""


def kg_blank_nodes() -> str:
    return f"""
SELECT DISTINCT
  '_:region' || CAST(r_regionkey AS VARCHAR) AS subject,
  '<{FOAF_NAME}>' AS predicate,
  '"' || r_name || '"' AS object
FROM region
"""


def kg_union_distinct() -> str:
    """Two rules emitting overlapping triples → set semantics collapses."""
    return f"""
SELECT DISTINCT
  '<{EX}customer/' || CAST(k AS VARCHAR) || '>' AS subject,
  '<{RDF_TYPE}>' AS predicate,
  '<{EX}Customer>' AS object
FROM (
  SELECT o_custkey AS k FROM orders
  UNION ALL
  SELECT c_custkey AS k FROM customer
)
"""


def kg_self_join_elimination() -> str:
    """Join-less referencing map (child==parent source & refs): the engine
    rewrites the join away; the oracle is the plain projection."""
    return f"""
SELECT DISTINCT
  '<{EX}part/' || CAST(p_partkey AS VARCHAR) || '>' AS subject,
  '<{EX}sameAs>' AS predicate,
  '<{EX}part/' || CAST(p_partkey AS VARCHAR) || '>' AS object
FROM part
"""


def kg_lineitem_orders_salted() -> str:
    """Skewed-key join (lineitem ⋈ orders) exercised through the salted
    join path; result must equal the plain join."""
    return f"""
SELECT DISTINCT
  '<{EX}lineitem/' || CAST(l_orderkey AS VARCHAR) || '/' || CAST(l_linenumber AS VARCHAR) || '>' AS subject,
  '<{EX}order>' AS predicate,
  '<{EX}order/' || CAST(o_orderkey AS VARCHAR) || '/' || o_orderstatus || '>' AS object
FROM lineitem JOIN orders ON CAST(l_orderkey AS VARCHAR) = CAST(o_orderkey AS VARCHAR)
"""


def kg_ntriples_escaping() -> str:
    """Literal escaping over synthesized dirty strings (backslash, quote,
    newline, tab, apostrophe, backspace, formfeed, carriage return) —
    replicates the reference's full escape chain in its exact order
    (materializer.py:144)."""
    backslash = "chr(92)"
    newline = "chr(10)"
    tab = "chr(9)"
    bs, ff, cr = "chr(8)", "chr(12)", "chr(13)"
    dirty = (f"""(c_mktsegment || {backslash} || '"q"' || {newline} || {tab}"""
             f""" || '''' || {bs} || {ff} || {cr})""")
    esc = dirty
    esc = f"replace({esc}, {backslash}, {backslash}||{backslash})"
    esc = f"replace({esc}, {newline}, {backslash}||'n')"
    esc = f"replace({esc}, {tab}, {backslash}||'t')"
    esc = f"replace({esc}, {bs}, {backslash}||'b')"
    esc = f"replace({esc}, {ff}, {backslash}||'f')"
    esc = f"replace({esc}, {cr}, {backslash}||'r')"
    esc = f"""replace({esc}, '"', {backslash}||'"')"""
    esc = f"replace({esc}, '''', {backslash}||'''')"
    return f"""
SELECT DISTINCT
  '<{EX}customer/' || CAST(c_custkey AS VARCHAR) || '>' AS subject,
  '<{EX}dirty>' AS predicate,
  '"' || {esc} || '"' AS object
FROM customer
"""


# ---------------------------------------------------------------------------
# Dedup / similarity / text oracles
# ---------------------------------------------------------------------------

_TOKENS = "string_split(text, ' ')"


def _shingles_cte(n: int = 3) -> str:
    """CTE producing distinct (doc_id, shingle) word n-grams."""
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, greatest(len(t) - {n - 1}, 0)),
             i -> {concat})) AS shingle
  FROM toks
),
sh AS (SELECT DISTINCT doc_id, shingle FROM grams)
"""


def dedup_exact() -> str:
    return """
SELECT md5(text) AS content_hash,
       min(doc_id) AS keep_id,
       count(*) AS n_dups
FROM documents
GROUP BY md5(text)
"""


def _minhash_bands_sql() -> tuple[str, str]:
    """(signature column list, banded-bucket UNION) — the DuckDB twin
    of the one banding scheme (dedup._band_bucket_expr), shared by
    every minhash oracle so the scheme is written once per engine."""
    h = h64_sql("shingle")
    sig_cols = ",\n         ".join(
        f"min({perm_sql(h, i)}) AS sig_{i}" for i in range(N_PERMS)
    )
    band_selects = []
    for b in range(LSH_BANDS):
        cols = " || '|' || ".join(
            f"CAST(sig_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(LSH_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sigs"
        )
    return sig_cols, "\nUNION ALL\n".join(band_selects)


def dedup_minhash_lsh() -> str:
    sig_cols, bands = _minhash_bands_sql()
    return f"""
WITH {_shingles_cte(3)},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def dedup_incremental(batch_mod: int = 10) -> str:
    """Twin of operators/dedup.incremental_dedup with the batch/index
    split ``doc_id % batch_mod == 0`` vs the rest: surviving batch ids
    after dropping any batch doc sharing a MinHash band bucket with an
    index doc. Same banding as dedup_minhash_lsh."""
    sig_cols, bands = _minhash_bands_sql()
    return f"""
WITH {_shingles_cte(3)},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands}
),
matched AS (
  SELECT DISTINCT b.doc_id
  FROM bands b JOIN bands i ON b.band = i.band AND b.bucket = i.bucket
  WHERE b.doc_id % {batch_mod} = 0 AND i.doc_id % {batch_mod} <> 0
)
SELECT doc_id FROM documents
WHERE doc_id % {batch_mod} = 0
  AND doc_id NOT IN (SELECT doc_id FROM matched)
"""


def dedup_minhash_capped(cap: int = 2) -> str:
    """Twin of minhash_lsh_pairs(bucket_cap=cap): buckets larger than
    ``cap`` contribute a star (min-id hub → each other member) instead
    of all pairs; under the cap the full pair set is unchanged. The
    hub condition ``a.doc_id = min(doc_id) OVER (bucket)`` combined
    with ``a.doc_id < b.doc_id`` yields exactly the star edges."""
    sig_cols, bands = _minhash_bands_sql()
    return f"""
WITH {_shingles_cte(3)},
sigs AS (
  SELECT doc_id,
         {sig_cols}
  FROM sh GROUP BY doc_id
),
bands AS (
{bands}
),
counted AS (
  SELECT doc_id, band, bucket,
         count(*) OVER (PARTITION BY band, bucket) AS bn,
         min(doc_id) OVER (PARTITION BY band, bucket) AS hub
  FROM bands
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM counted a JOIN counted b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
  AND (a.bn <= {cap} OR a.doc_id = a.hub)
"""


def dedup_simhash(bits: int = 32) -> str:
    h = h64_sql("token")
    sums = ",\n         ".join(
        f"sum(CASE WHEN (({h}) >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits)
    )
    combine = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS}) AS token FROM documents
),
agg AS (
  SELECT doc_id,
         {sums}
  FROM toks GROUP BY doc_id
)
SELECT doc_id, {combine} AS simhash FROM agg
"""


def dedup_simhash_pairs(max_hamming: int = 6, bits: int = 32,
                        n_bands: int | None = None) -> str:
    """Banded SimHash near-dup pairs (pigeonhole candidates, exact
    hamming via bit_count(xor)). ``n_bands`` defaults to
    ``max_hamming + 1`` — must stay in lockstep with
    operators/dedup.simhash_pairs for hash parity."""
    if n_bands is None:
        n_bands = max_hamming + 1
    base = dedup_simhash(bits)
    width = bits // n_bands
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"(simhash >> {b * width}) & {(1 << width) - 1} AS val FROM sims"
        for b in range(n_bands)
    )
    return f"""
WITH sims AS ({base}),
bands AS (
{band_rows}
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
WHERE a.doc_id < b.doc_id
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def dedup_ngram_jaccard_topk(k: int = 10) -> str:
    return f"""
WITH {_shingles_cte(3)},
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
ORDER BY jaccard DESC, id_a, id_b
LIMIT {k}
"""


_DOT = ("list_sum(list_transform(generate_series(1, len(a.v)), "
        "i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE)))")


def dedup_embedding_cosine(threshold: float = 0.8) -> str:
    norm = ("sqrt(list_sum(list_transform({x}.v, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))")
    return f"""
WITH v AS (SELECT vec_id, label AS block, embedding AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_DOT} / ({norm.format(x='a')} * {norm.format(x='b')}), 6) AS cos_sim
  FROM v a JOIN v b ON a.block = b.block
  WHERE a.vec_id < b.vec_id
)
SELECT * FROM pairs WHERE cos_sim >= {threshold}
"""


def dedup_clusters(max_hamming: int = 6, bits: int = 32) -> str:
    """Connected components over SimHash near-dup pairs via a recursive
    CTE: every doc labeled with the min doc_id reachable through dup
    edges (singletons keep their own id). Twin of operators/dedup.
    dup_clusters' min-label propagation fixpoint."""
    n_bands = max_hamming + 1
    base = dedup_simhash(bits)
    width = bits // n_bands
    band_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, simhash, {b} AS band, "
        f"(simhash >> {b * width}) & {(1 << width) - 1} AS val FROM sims"
        for b in range(n_bands)
    )
    return f"""
WITH RECURSIVE
sims AS ({base}),
bands AS (
{band_rows}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.val = b.val
  WHERE a.doc_id < b.doc_id
    AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
"""


def text_pii_scrub() -> str:
    """PII masking twin: emails first, then long digit runs. The dirty
    column is synthesized identically on both sides."""
    from morph_kgc_spark.operators.text import (
        PII_EMAIL_RE,
        PII_EMAIL_TOKEN,
        PII_LONG_DIGITS_RE,
        PII_NUMBER_TOKEN,
    )

    dirty = ("text || ' contact user' || CAST(doc_id AS VARCHAR) || "
             "'@ex-mail.org or +1 555 0100 ' || CAST(doc_id AS VARCHAR)")
    no_email = f"regexp_replace({dirty}, '{PII_EMAIL_RE}', '{PII_EMAIL_TOKEN}', 'g')"
    return f"""
SELECT doc_id,
       regexp_replace({no_email}, '{PII_LONG_DIGITS_RE}',
                      '{PII_NUMBER_TOKEN}', 'g') AS clean_text,
       len(regexp_extract_all({dirty}, '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all({no_email}, '{PII_LONG_DIGITS_RE}')) AS n_numbers
FROM documents
"""


def kg_named_graphs() -> str:
    """Graph maps → N-Quads: customer triples land in a per-mktsegment
    named graph (4-column result)."""
    return f"""
SELECT DISTINCT
  '<{EX}customer/' || CAST(c_custkey AS VARCHAR) || '>' AS subject,
  '<{EX}balance>' AS predicate,
  '"' || CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
      || '"^^<{XSD}decimal>' AS object,
  '<{EX}graph/' || c_mktsegment || '>' AS graph
FROM customer
"""


def kg_rdf_star() -> str:
    """RML-star: quoted triple in object position —
    << order totalPrice "x" >> annotated with the order date."""
    return f"""
SELECT DISTINCT
  '<{EX}order/' || CAST(o_orderkey AS VARCHAR) || '>' AS subject,
  '<{EX}assertedOn>' AS predicate,
  '<< <{EX}order/' || CAST(o_orderkey AS VARCHAR) || '> <{EX}status> "'
      || o_orderstatus || '" >>' AS object
FROM orders
"""


def kg_rdf_star_ttl() -> str:
    """RML-star driven from a Turtle mapping DOCUMENT (not programmatic
    rules): a NonAssertedTriplesMap quoted in subject position —
    << order status "st" >> ex:takenBy "clerk"."""
    return f"""
SELECT DISTINCT
  '<< <{EX}order/' || CAST(o_orderkey AS VARCHAR) || '> <{EX}status> "'
      || o_orderstatus || '" >>' AS subject,
  '<{EX}takenBy>' AS predicate,
  '"' || o_orderpriority || '"' AS object
FROM orders
"""


def kg_yarrrml_doc() -> str:
    """Three-rule YARRRML document over customer: plain literal po,
    language-tagged po, and a referencing object map with condition."""
    return f"""
SELECT DISTINCT subject, predicate, object FROM (
  SELECT
    '<{EX}customer/' || CAST(c_custkey AS VARCHAR) || '>' AS subject,
    '<{FOAF_NAME}>' AS predicate,
    '"' || c_name || '"' AS object
  FROM customer
  UNION ALL
  SELECT
    '<{EX}customer/' || CAST(c_custkey AS VARCHAR) || '>',
    '<{EX}segment>',
    '"' || c_mktsegment || '"@en'
  FROM customer
  UNION ALL
  SELECT
    '<{EX}customer/' || CAST(c_custkey AS VARCHAR) || '>',
    '<{EX}nation>',
    '<{EX}nation/' || n_name || '>'
  FROM customer JOIN nation
    ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
)
"""


def kg_xml_xpath() -> str:
    """Twin of the XML-roundtrip query: the XML document is generated
    from the region table, so the oracle is the plain projection."""
    return f"""
SELECT DISTINCT
  '<{EX}region/' || CAST(r_regionkey AS VARCHAR) || '>' AS subject,
  '<{EX}name>' AS predicate,
  '"' || r_name || '"' AS object
FROM region
"""


def kg_fnml_composed() -> str:
    """FNML twin: function in PREDICATE position (idlab:concat of a
    constant prefix + lang reference) and a composed execution in object
    position (toUpperCase ∘ string_trim). Escape chain mirrors the
    compiled literal path."""
    esc = "replace(replace(upper(trim(text)), chr(92), chr(92)||chr(92)), '\"', chr(92)||'\"')"
    return f"""
SELECT DISTINCT
  '<{EX}doc/' || CAST(doc_id AS VARCHAR) || '>' AS subject,
  '<{EX}pred/' || lang || '>' AS predicate,
  '"' || {esc} || '"' AS object
FROM documents
"""


def kg_gather_bag() -> str:
    """RML-CC named container: one rdf:Bag of order IRIs per customer.
    Membership order = lexicographic IRI order (the melt/sort semantics).
    DuckDB zips parallel unnests, giving (pos, term) pairs."""
    o_iri = "'<" + EX + "order/' || CAST(o_orderkey AS VARCHAR) || '>'"
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    return f"""
WITH l AS (
  SELECT o_custkey,
         list({o_iri} ORDER BY {o_iri}) AS vals
  FROM orders GROUP BY o_custkey
)
SELECT DISTINCT subject, predicate, object FROM (
  SELECT '<{EX}customer/' || CAST(o_custkey AS VARCHAR) || '>' AS subject,
         '<{EX}orders>' AS predicate,
         '<{EX}orderbag/' || CAST(o_custkey AS VARCHAR) || '>' AS object
  FROM l
  UNION ALL
  SELECT '<{EX}orderbag/' || CAST(o_custkey AS VARCHAR) || '>',
         '<{rdf}type>', '<{rdf}Bag>'
  FROM l
  UNION ALL
  SELECT '<{EX}orderbag/' || CAST(o_custkey AS VARCHAR) || '>',
         '<{rdf}_' || CAST(unnest(generate_series(1, len(vals))) AS VARCHAR) || '>',
         unnest(vals)
  FROM l
)
"""


def kg_gather_subject_seq() -> str:
    """RML-CC SUBJECT-position gather twin: each region is the head of an
    rdf:Seq of its nation names (document order = sorted names in the
    generated JSON), plus one constant predicate-object pair. The oracle
    re-derives membership indexes with ROW_NUMBER over the same order."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    subj = f"'<{EX}region/' || replace(r_name, ' ', '%20') || '>'"
    return f"""
WITH m AS (
  SELECT r.r_name,
         n.n_name AS nation,
         ROW_NUMBER() OVER (PARTITION BY r.r_regionkey
                            ORDER BY n.n_name) AS pos
  FROM nation n
  JOIN region r
    ON CAST(n.n_regionkey AS VARCHAR) = CAST(r.r_regionkey AS VARCHAR)
)
SELECT {subj} AS subject,
       '<{rdf}_' || CAST(pos AS VARCHAR) || '>' AS predicate,
       '"' || nation || '"' AS object
FROM m
UNION ALL
SELECT DISTINCT {subj}, '<{rdf}type>', '<{rdf}Seq>' FROM m
UNION ALL
SELECT DISTINCT {subj}, '<{EX}source>', '"tpch"' FROM m
"""


def ann_ivf_topk(k: int = 5, n_queries: int = 10, nprobe: int = 1) -> str:
    """IVF two-stage ANN: rank cells by centroid dot product, exact
    cosine inside the probed cell only."""
    dot_qc = ("list_sum(list_transform(generate_series(1, 64), "
              "i -> CAST(qv[i] AS DOUBLE) * centroid[i]))")
    dot_qv = ("list_sum(list_transform(generate_series(1, 64), "
              "i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))")
    return f"""
WITH c AS (SELECT vec_id, label AS cell, embedding AS v FROM embeddings),
cent AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM (
    SELECT cell, t.i AS pos, avg(CAST(v[t.i] AS DOUBLE)) AS m
    FROM c, range(1, 65) t(i)
    GROUP BY cell, t.i
  ) GROUP BY cell
),
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {n_queries}),
probed AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cent.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({dot_qc}, 6) DESC, cent.cell) AS cr
    FROM q, cent
  ) WHERE cr <= {nprobe}
),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         round({dot_qv.replace('cv', 'c.v')}, 6) AS cos_sim
  FROM probed JOIN c ON c.cell = probed.cell
  WHERE c.vec_id <> query_id
)
SELECT query_id, neighbor_id, rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ann_cosine_topk(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH c AS (SELECT vec_id, embedding AS v FROM embeddings),
q AS (SELECT vec_id, embedding AS v FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_sum(list_transform(generate_series(1, len(a.v)),
               i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))), 6) AS cos_sim
  FROM c a, q b
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= {k}
"""


def ann_lsh_topk(k: int = 5, n_queries: int = 10, bits: int = 4,
                 probe_hamming: int = 1) -> str:
    """Twin of similarity.lsh_topk: same axis-aligned sign bucket, exact
    cosine within the shared bucket(s), same tie-break. With
    ``probe_hamming=1`` (the shipped default) the query side is
    replicated across its own bucket plus the ``bits`` single-bit
    flips, exactly mirroring ``_probe_buckets`` — probed buckets are
    disjoint, so the join stream needs no pair dedup."""
    sign = (f"array_to_string(list_transform(v[1:{bits}], "
            "x -> CASE WHEN CAST(x AS DOUBLE) >= 0 THEN '1' ELSE '0' END), '')")
    if probe_hamming:
        q_cte = f"""
q0 AS (SELECT vec_id, embedding AS v, {sign} AS bucket FROM embeddings
       WHERE vec_id < {n_queries}),
q AS (
  SELECT vec_id, v,
         CASE WHEN p = 0 THEN bucket
              ELSE substring(bucket, 1, p - 1)
                   || (CASE WHEN substring(bucket, p, 1) = '1'
                       THEN '0' ELSE '1' END)
                   || substring(bucket, p + 1, {bits} - p)
         END AS bucket
  FROM q0, generate_series(0, {bits}) AS t(p)
)"""
    else:
        q_cte = f"""
q AS (SELECT vec_id, embedding AS v, {sign} AS bucket FROM embeddings
      WHERE vec_id < {n_queries})"""
    return f"""
WITH c AS (SELECT vec_id, embedding AS v, {sign} AS bucket FROM embeddings),
{q_cte},
scored AS (
  SELECT b.vec_id AS query_id, a.vec_id AS neighbor_id,
         round(list_sum(list_transform(generate_series(1, len(a.v)),
               i -> CAST(a.v[i] AS DOUBLE) * CAST(b.v[i] AS DOUBLE))), 6) AS cos_sim
  FROM c a JOIN q b ON a.bucket = b.bucket
  WHERE a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cos_sim FROM ranked WHERE rank <= {k}
"""


def text_token_stats() -> str:
    return f"""
SELECT doc_id,
       len({_TOKENS}) AS n_tokens,
       length(text) AS n_chars,
       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
             / CAST(len({_TOKENS}) AS DOUBLE), 6) AS mean_token_len
FROM documents
"""


def text_bpe_tokens() -> str:
    """Twin of operators.text.bpe_token_count — the SAME pattern string
    (it is restricted to syntax Java regex and RE2 read identically)."""
    from morph_kgc_spark.operators.text import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe_tokens,
       CAST(len({_TOKENS}) AS BIGINT) AS n_ws_tokens
FROM documents
"""


def text_language_id() -> str:
    langs = sorted(LANG_PROFILES)
    score_cols = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        score_cols.append(
            f"len(list_filter({_TOKENS}, x -> x IN ({words}))) AS s_{lang}"
        )
    # argmax with alphabetical tie-break: strict > against running best
    pred = f"'{langs[0]}'"
    best = f"s_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"CASE WHEN s_{lang} > {best} THEN s_{lang} ELSE {best} END"
    return f"""
WITH scored AS (
  SELECT doc_id, {', '.join(score_cols)} FROM documents
)
SELECT doc_id, {pred} AS pred_lang, CAST({best} AS BIGINT) AS score
FROM scored
"""


def text_quality_score() -> str:
    t = _TOKENS
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(len({t}) AS DOUBLE) AS n_tok,
         CAST(len(list_distinct({t})) AS DOUBLE) AS uniq,
         CAST(length(replace(text, ' ', '')) AS DOUBLE) AS non_space
  FROM documents
)
SELECT doc_id,
       round(0.3 * least(CAST(1.0 AS DOUBLE), n_tok / CAST(100.0 AS DOUBLE))
           + 0.4 * (uniq / n_tok)
           + 0.3 * least(CAST(1.0 AS DOUBLE), (non_space / n_tok) / CAST(8.0 AS DOUBLE)), 6)
       AS quality
FROM s
"""


def text_repetition_stats() -> str:
    """Twin of operators.text.repetition_stats. The Spark side computes
    the bigram mode row-locally (sorted-run max); the oracle reaches
    the same number the relational way (unnest + group by + max) —
    twins must agree on RESULTS, not strategy."""
    def grams(n: int) -> str:
        concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        return (f"list_transform(generate_series(1, "
                f"greatest(len(t) - {n - 1}, 0)), i -> {concat})")

    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
g AS (SELECT doc_id, t AS t1, {grams(2)} AS t2, {grams(3)} AS t3 FROM toks),
b AS (SELECT doc_id, unnest(t2) AS gram FROM g),
bc AS (SELECT doc_id, gram, count(*) AS c FROM b GROUP BY 1, 2),
bt AS (SELECT doc_id, max(c) AS topc FROM bc GROUP BY 1)
SELECT g.doc_id,
       CASE WHEN len(t1) > 0 THEN round(1.0 - CAST(len(list_distinct(t1)) AS DOUBLE)
                                              / CAST(len(t1) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN len(t2) > 0 THEN round(CAST(topc AS DOUBLE)
                                        / CAST(len(t2) AS DOUBLE), 6)
            ELSE 0.0 END AS top_bigram_frac,
       CASE WHEN len(t3) > 0 THEN round(1.0 - CAST(len(list_distinct(t3)) AS DOUBLE)
                                              / CAST(len(t3) AS DOUBLE), 6)
            ELSE 0.0 END AS dup_trigram_frac
FROM g LEFT JOIN bt USING (doc_id)
"""


def text_fingerprint() -> str:
    h = h64_sql("t[i]")
    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents)
SELECT doc_id,
       CAST(COALESCE(list_sum(list_transform(
           generate_series(1, len(t)),
           i -> (({h}) % {P31}) * i % {P31})), 0) % {P31} AS BIGINT) AS fingerprint
FROM toks
"""


# ---------------------------------------------------------------------------
# events: sessionization + windowed rollup
# ---------------------------------------------------------------------------


def rollup_pricing_summary() -> str:
    """TPC-H Q1-shaped pricing summary (decimal-exact aggregates)."""
    return """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def rollup_top_customers(k: int = 10) -> str:
    """Join + agg + deterministic top-k (order value per customer)."""
    return f"""
SELECT c_custkey, c_name,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spent,
       count(*) AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT {k}
"""


def events_sessionize(gap_s: int = 1800) -> str:
    # second-truncated epochs to match Spark's unix_timestamp()
    ep = "epoch(date_trunc('second', {t}))"
    return f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN {ep.format(t='ts')} - {ep.format(t='lag(ts) OVER w')} > {gap_s}
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM ordered
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       CAST({ep.format(t='min(ts)')} AS BIGINT) AS start_epoch,
       CAST({ep.format(t='max(ts)')} AS BIGINT) AS end_epoch
FROM sessions
GROUP BY user_id, session_no
"""


def events_hourly_rollup() -> str:
    return """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       event_type,
       count(*) AS n_events,
       round(sum(CAST(value AS DOUBLE)), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# multimodal: decoded-image stats (operators/multimodal.py synth_ppm_media
# + image_pixel_stats — the REAL stdlib P6 decode, verified end-to-end)
# ---------------------------------------------------------------------------


def multimodal_decode_stats() -> str:
    """Replays the synthetic-P6 pipeline entirely in SQL: dimensions from
    the id, raster hex = md5(id) repeated/truncated, pixel_hash = md5 of
    that hex string. The Spark side must ENCODE the PPM, DECODE it with
    the stdlib codec, and hash the decoded raster to match."""
    from morph_kgc_spark.operators.multimodal import (
        SYNTH_H_BASE,
        SYNTH_H_MOD,
        SYNTH_W_BASE,
        SYNTH_W_MOD,
    )

    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         CAST({SYNTH_W_BASE} + doc_id % {SYNTH_W_MOD} AS INT) AS width,
         CAST({SYNTH_H_BASE} + doc_id % {SYNTH_H_MOD} AS INT) AS height
  FROM documents
)
SELECT media_id, width, height, 3 AS n_channels,
       md5(substr(repeat(md5(media_id),
                         CAST(ceil((width * height * 3 * 2) / 32.0) AS INT)),
                  1, width * height * 3 * 2)) AS pixel_hash
FROM d
"""


def _shingles_cte_over(src: str, alias: str, n: int = 3) -> str:
    """Like :func:`_shingles_cte` but over an arbitrary relation
    ``src`` (must expose doc_id, text), emitting CTE ``<alias>sh``."""
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
{alias}toks AS (SELECT doc_id, {_TOKENS} AS t FROM {src}),
{alias}grams AS (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, greatest(len(t) - {n - 1}, 0)),
             i -> {concat})) AS shingle
  FROM {alias}toks
),
{alias}sh AS (SELECT DISTINCT doc_id, shingle FROM {alias}grams)"""


def llm_decontaminate(n: int = 3, min_hit: int = 5, bench_mod: int = 20,
                      bench_rem: int = 7) -> str:
    """Twin of operators/curation.decontaminate over the deterministic
    corpus/benchmark split of the documents table: per corpus doc, the
    count of its distinct word n-grams occurring anywhere in the
    benchmark set, and the ``n_hit >= min_hit`` contamination flag."""
    return f"""
WITH corpus AS (SELECT doc_id, text FROM documents
                WHERE doc_id % {bench_mod} <> {bench_rem}),
bench AS (SELECT doc_id, text FROM documents
          WHERE doc_id % {bench_mod} = {bench_rem}),
{_shingles_cte_over('corpus', 'c', n)},
{_shingles_cte_over('bench', 'b', n)},
bset AS (SELECT DISTINCT shingle FROM bsh),
stats AS (
  SELECT c.doc_id, count(*) AS n_grams, count(b.shingle) AS n_hit
  FROM csh c LEFT JOIN bset b USING (shingle)
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_grams, 0) AS INT) AS n_grams,
       CAST(COALESCE(s.n_hit, 0) AS INT) AS n_hit,
       COALESCE(s.n_hit, 0) >= {min_hit} AS contaminated
FROM corpus d LEFT JOIN stats s USING (doc_id)
"""


def _sample_bucket_sql(salt: str) -> str:
    """DuckDB twin of curation._bucket: h64('salt|' || id) % 10^6."""
    h = h64_sql(f"'{salt}|' || CAST(doc_id AS VARCHAR)")
    return f"({h} % 1000000)"


def llm_sample_stratified(rates: dict[str, float], default_rate: float,
                          salt: str) -> str:
    """Twin of curation.sample_stratified on documents, stratified by
    lang. Thresholds are truncated to integer buckets in PYTHON (same
    as the Spark side) so no engine double→long cast is in play."""
    case = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {int(v * 1_000_000)}"
        for k, v in sorted(rates.items())) + \
        f" ELSE {int(default_rate * 1_000_000)} END"
    return f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_sample_bucket_sql(salt)} < {case}
"""


def audio_decode_stats() -> str:
    """Replays the synthetic PCM-WAV pipeline entirely in SQL: rate/
    channels/frames from the id, int16 samples = big-endian 4-hex-char
    groups of md5(id) repeated (recentred to signed), sample_hash = md5
    of the comma-joined decimal values in frame order. The Spark side
    must ENCODE the RIFF container, walk its chunks back with the real
    decoder, and hash the decoded samples to match
    (operators/multimodal.py synth_wav_media/audio_sample_stats)."""
    from morph_kgc_spark.operators.multimodal import (
        SYNTH_WAV_F_BASE,
        SYNTH_WAV_F_MOD,
        SYNTH_WAV_RATES,
    )

    rates = ", ".join(str(r) for r in SYNTH_WAV_RATES)
    hexd = "'0123456789abcdef'"

    def nib(off: int) -> str:
        return f"(strpos({hexd}, substr(hx, (j-1)*4+{off}, 1)) - 1)"

    u = (f"{nib(1)}*4096 + {nib(2)}*256 + {nib(3)}*16 + {nib(4)}")
    return f"""
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS media_id,
         CAST(1 + doc_id % 2 AS INT) AS channels,
         CAST(([{rates}])[CAST(doc_id % {len(SYNTH_WAV_RATES)} AS INT) + 1]
              AS INT) AS sample_rate,
         CAST({SYNTH_WAV_F_BASE} + doc_id % {SYNTH_WAV_F_MOD} AS INT)
           AS n_frames
  FROM documents
), h AS (
  SELECT *, n_frames * channels AS n_samp,
         substr(repeat(md5(media_id),
                       CAST(ceil((n_frames * channels * 4) / 32.0) AS INT)),
                1, n_frames * channels * 4) AS hx
  FROM d
)
SELECT media_id, channels, sample_rate, CAST(16 AS INT) AS bits, n_frames,
       round(CAST(n_frames AS DOUBLE) / sample_rate, 6) AS duration_s,
       md5(array_to_string(
         list_transform(
           list_transform(generate_series(1, n_samp), j -> {u}),
           u -> CAST(CASE WHEN u >= 32768 THEN u - 65536 ELSE u END
                     AS VARCHAR)),
         ',')) AS sample_hash
FROM h
"""


# ---------------------------------------------------------------------------
# k-means coarse quantizer (operators/similarity.py kmeans_train/kmeans_cells)
# ---------------------------------------------------------------------------


def _kmeans_ctes(k: int = 8, iters: int = 2, dim: int = 64,
                 scale: int = 1_000_000, init: str = "min_id") -> str:
    """CTE chain replaying kmeans_train/kmeans_cells bit-for-bit:
    min-id or farthest-point seeds, per-cell SCALED-INTEGER means
    (exact, order-independent), squared-L2 assignment in coordinate
    order with lowest-cell tie-break. Final assignment CTE is
    ``kcells``."""

    def dist(vexpr: str, cexpr: str) -> str:
        return (f"list_sum(list_transform(generate_series(1, {dim}), "
                f"i -> ({vexpr}[i] - {cexpr}[i]) * ({vexpr}[i] - {cexpr}[i])))")

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
  SELECT id, v, cell FROM (
    SELECT c.id, c.v, s.cell,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {dist('c.v', 's.v')}, s.cell) AS rn
    FROM c CROSS JOIN {cent} s
  ) WHERE rn = 1)"""

    parts = [
        """c AS (SELECT vec_id AS id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings)""",
    ]
    if init == "farthest":
        # replay _farthest_point_seeds: seed 0 = min-id vector; seed i
        # maximizes the MIN squared-L2 distance to seeds 0..i-1, ties
        # to the lowest id (argmax-deterministic — no RNG)
        parts.append(
            "seeds0 AS (SELECT 0 AS cell, id, v FROM c ORDER BY id LIMIT 1)")
        for i in range(1, k):
            parts.append(f"""pick{i} AS (
  SELECT {i} AS cell, t.id, c2.v FROM (
    SELECT c.id, MIN({dist('c.v', 's.v')}) AS md
    FROM c CROSS JOIN seeds{i - 1} s GROUP BY c.id
    ORDER BY md DESC, c.id LIMIT 1) t
  JOIN c c2 ON c2.id = t.id)""")
            parts.append(f"""seeds{i} AS (
  SELECT * FROM seeds{i - 1} UNION ALL SELECT * FROM pick{i})""")
        parts.append(f"cent0 AS (SELECT cell, v FROM seeds{k - 1})")
    else:
        parts.append(
            f"""cent0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cell, v
    FROM (SELECT id, v FROM c ORDER BY id LIMIT {k}))""")
    for it in range(iters - 1):
        parts.append(assign(f"a{it}", f"cent{it}"))
        parts.append(f"""u{it} AS (
  SELECT cell, t.i AS pos,
         SUM(CAST(round(v[t.i] * {scale}) AS BIGINT)) AS sx,
         COUNT(*) AS n
  FROM a{it}, range(1, {dim + 1}) t(i) GROUP BY cell, t.i)""")
        parts.append(f"""cent{it + 1} AS (
  SELECT p.cell, COALESCE(u.vv, p.v) AS v
  FROM cent{it} p LEFT JOIN (
    SELECT cell, list((CAST(sx AS DOUBLE) / n) / {scale}.0 ORDER BY pos) AS vv
    FROM u{it} GROUP BY cell) u USING (cell))""")
    parts.append(assign("kcells", f"cent{iters - 1}"))
    return ",\n".join(parts)


def ann_kmeans_cells(k: int = 8, iters: int = 2,
                     init: str = "min_id") -> str:
    return f"""
WITH {_kmeans_ctes(k, iters, init=init)}
SELECT id AS vec_id, cell FROM kcells
"""


def ann_ivf_kmeans_topk(k: int = 5, n_queries: int = 10, nprobe: int = 2,
                        n_cells: int = 8, iters: int = 2) -> str:
    """IVF top-k over TRAINED k-means cells (no precomputed label):
    the kmeans CTE chain feeds the same two-stage IVF logic as
    ann_ivf_topk."""
    dot_qc = ("list_sum(list_transform(generate_series(1, 64), "
              "i -> qv[i] * centroid[i]))")
    dot_qv = ("list_sum(list_transform(generate_series(1, 64), "
              "i -> qv[i] * cv[i]))")
    return f"""
WITH {_kmeans_ctes(n_cells, iters)},
cc AS (SELECT id AS vec_id, cell, v FROM kcells),
cent AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM (
    SELECT cell, t.i AS pos, avg(v[t.i]) AS m
    FROM cc, range(1, 65) t(i)
    GROUP BY cell, t.i
  ) GROUP BY cell
),
q AS (SELECT vec_id AS query_id, v AS qv FROM cc WHERE vec_id < {n_queries}),
probed AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cent.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY round({dot_qc}, 6) DESC, cent.cell) AS cr
    FROM q, cent
  ) WHERE cr <= {nprobe}
),
scored AS (
  SELECT query_id, cc.vec_id AS neighbor_id,
         round({dot_qv.replace('cv', 'cc.v')}, 6) AS cos_sim
  FROM probed JOIN cc ON cc.cell = probed.cell
  WHERE cc.vec_id <> query_id
)
SELECT query_id, neighbor_id, rank, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def dedup_ngram_capped(cap: int = 3) -> str:
    """Twin of ngram_capped_pairs(star_cap=cap): posting lists larger
    than ``cap`` contribute star edges only (min-id hub), smaller lists
    the full i<j pairs; jaccard is exact over ALL shingles for every
    surviving candidate. The jaccard runs in the SAME h64 space as the
    Spark side (distinct md5-derived hashes per doc), so the twin is
    bit-exact even in the 2^-60 event of a hash collision."""
    hs = h64_sql("shingle")
    return f"""
WITH {_shingles_cte(3)},
hsh AS (SELECT DISTINCT doc_id, {hs} AS hs FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM hsh GROUP BY doc_id),
counted AS (
  SELECT doc_id, shingle,
         count(*) OVER (PARTITION BY shingle) AS pn,
         min(doc_id) OVER (PARTITION BY shingle) AS hub
  FROM sh),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM counted a JOIN counted b ON a.shingle = b.shingle
  WHERE a.doc_id < b.doc_id AND (a.pn <= {cap} OR a.doc_id = a.hub)),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN hsh x ON x.doc_id = c.id_a
  JOIN hsh y ON y.doc_id = c.id_b AND y.hs = x.hs
  GROUP BY c.id_a, c.id_b)
SELECT i.id_a, i.id_b,
       round(CAST(i.i AS DOUBLE) / (sa.sz + sb.sz - i.i), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.id_a
JOIN sizes sb ON sb.doc_id = i.id_b
"""


def web_url_dedup() -> str:
    """Twin of weburl.url_dedup over urls synthesized from doc_id: the
    synthesis AND the canonicalization render the SAME dual-dialect
    template as the Spark side (weburl.synth_url_sql /
    canonical_url_sql), so the replay is bit-exact by construction."""
    from morph_kgc_spark.operators.weburl import (canonical_url_sql,
                                                  synth_url_sql)

    synth = synth_url_sql("duckdb", "doc_id")
    canon = canonical_url_sql("duckdb", "url")
    return f"""
WITH urls AS (SELECT doc_id, {synth} AS url FROM documents),
canon AS (SELECT doc_id, {canon} AS canonical_url FROM urls)
SELECT canonical_url, min(doc_id) AS keep_id, count(*) AS n_dups
FROM canon GROUP BY canonical_url
"""


def web_domain_stats() -> str:
    """Twin of weburl.domain_stats (registered-domain accounting over
    canonicalized synthetic urls)."""
    from morph_kgc_spark.operators.weburl import (canonical_url_sql,
                                                  domain_sql,
                                                  synth_url_sql)

    synth = synth_url_sql("duckdb", "doc_id")
    canon = canonical_url_sql("duckdb", "url")
    dom = domain_sql("duckdb", "canonical_url")
    return f"""
WITH urls AS (SELECT doc_id, {synth} AS url FROM documents),
canon AS (SELECT doc_id, {canon} AS canonical_url FROM urls),
dom AS (SELECT doc_id, canonical_url, {dom} AS domain FROM canon)
SELECT domain, count(*) AS n_urls,
       count(DISTINCT canonical_url) AS n_pages
FROM dom GROUP BY domain
"""


def curation_pipeline(min_tokens: int = 20, n: int = 3, min_hit: int = 5,
                      rate: float = 0.7, salt: str = "pipe") -> str:
    """Twin of the COMPOSED curation pipeline query (q_curation_pipeline):
    URL-level dedup -> exact text dedup -> token-count gate ->
    benchmark decontamination -> deterministic sample. Stage order
    matters for the dedup keepers (min-id among the docs still present),
    so the first two stages chain; the per-doc flags (token count,
    contamination, sample bucket) are pure functions of the doc and are
    computed over the full table then joined — same results, simpler
    SQL."""
    from morph_kgc_spark.operators.weburl import (canonical_url_sql,
                                                  synth_url_sql)

    synth = synth_url_sql("duckdb", "doc_id")
    canon = canonical_url_sql("duckdb", "url")
    return f"""
WITH urls AS (SELECT doc_id, {synth} AS url FROM documents),
urld AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id, {canon} AS c FROM urls) GROUP BY c),
d1 AS (SELECT d.* FROM documents d JOIN urld USING (doc_id)),
exd AS (SELECT min(doc_id) AS doc_id FROM d1 GROUP BY md5(text)),
d2 AS (SELECT d1.* FROM d1 JOIN exd USING (doc_id)),
d3 AS (SELECT * FROM d2 WHERE len({_TOKENS}) >= {min_tokens}),
corpus AS (SELECT * FROM d3 WHERE doc_id % 20 <> 7),
bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 20 = 7),
{_shingles_cte_over('corpus', 'c', n)},
{_shingles_cte_over('bench', 'b', n)},
bset AS (SELECT DISTINCT shingle FROM bsh),
hits AS (
  SELECT c.doc_id, count(b.shingle) AS n_hit
  FROM csh c LEFT JOIN bset b USING (shingle)
  GROUP BY c.doc_id)
SELECT doc_id, lang, source, n_chars
FROM corpus LEFT JOIN hits USING (doc_id)
WHERE COALESCE(n_hit, 0) < {min_hit}
  AND {_sample_bucket_sql(salt)} < {int(rate * 1_000_000)}
"""


def llm_chunk_documents(chunk_tokens: int = 40, overlap: int = 8) -> str:
    """Twin of operators/packing.chunk_documents: window k starts at
    token 1 + k*(chunk_tokens-overlap); chunk_idx recovered as
    (start-1) // step (the starts are an arithmetic sequence, so no
    WITH ORDINALITY is needed)."""
    step = chunk_tokens - overlap
    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
starts AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - {overlap}, 1),
                                {step})) AS s
  FROM toks)
SELECT doc_id,
       CAST((s - 1) // {step} AS INT) AS chunk_idx,
       CAST(len(list_slice(t, s, s + {chunk_tokens} - 1)) AS INT)
         AS chunk_n_tokens,
       array_to_string(list_slice(t, s, s + {chunk_tokens} - 1), ' ')
         AS chunk_text
FROM starts
"""


def llm_pack_sequences(max_tokens: int = 512, n_shards: int = 16) -> str:
    """Twin of operators/packing.pack_sequences over whitespace token
    counts of the documents table (offset packing within h64 shards)."""
    h = h64_sql("'shard|' || CAST(doc_id AS VARCHAR)")
    shard = f"({h} % {n_shards})"
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len({_TOKENS}) AS BIGINT) AS tc,
         {shard} AS shard
  FROM documents),
ofs AS (
  SELECT doc_id, shard, tc,
         sum(tc) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS UNBOUNDED PRECEDING) - tc AS bin_start_offset
  FROM base)
SELECT doc_id, shard,
       CAST(bin_start_offset // {max_tokens} AS BIGINT) AS bin_idx,
       CAST(bin_start_offset AS BIGINT) AS bin_start_offset
FROM ofs
"""


def llm_repeated_passages(tile_tokens: int = 10, max_df: int = 2) -> str:
    """Twin of curation.remove_repeated_passages: token tiles, corpus
    occurrence count, hot tiles dropped, in-order reassembly hashed."""
    T = tile_tokens
    h = h64_sql("tile")
    return f"""
WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
sized AS (
  SELECT doc_id, t,
         greatest(CAST(ceil(len(t) / {T}.0) AS INT), 1) AS nt
  FROM toks),
tiles AS (
  SELECT doc_id, unnest(generate_series(0, nt - 1)) AS idx, t
  FROM sized),
tv AS (
  SELECT doc_id, idx,
         array_to_string(list_slice(t, idx * {T} + 1, idx * {T} + {T}),
                         ' ') AS tile
  FROM tiles),
hv AS (SELECT doc_id, idx, tile, {h} AS h FROM tv),
hot AS (
  SELECT h, TRUE AS ishot
  FROM (SELECT h, count(*) AS df FROM hv GROUP BY h)
  WHERE df > {max_df}),
marked AS (
  SELECT v.doc_id, v.idx, v.tile,
         coalesce(hot.ishot, FALSE) AS ishot
  FROM hv v LEFT JOIN hot USING (h))
SELECT doc_id,
       count(*) AS n_tiles,
       CAST(sum(CASE WHEN NOT ishot THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       md5(coalesce(
           string_agg(CASE WHEN NOT ishot THEN tile END, ' '
                      ORDER BY idx), '')) AS clean_md5
FROM marked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Round-6 additions: KG profiling, dedup survivor selection, tf-idf
# ---------------------------------------------------------------------------


def _profile_triples_sql() -> str:
    """The three-stream profile union (typed literals + customer names
    + rdf:type) — written ONCE; the KG-profiling oracles and their
    Spark twins (__spark_entry__._kg_profile_triples) must stay in
    lockstep on the stream list."""
    return f"""  ({kg_typed_literals()})
  UNION ALL
  ({kg_customer_triples()})
  UNION ALL
  ({kg_rdf_type()})"""


def kg_characteristic_sets() -> str:
    """Twin of operators/kgstats.characteristic_sets over the UNION ALL
    of three materialized streams (each internally distinct, mutually
    disjoint predicates — matching the Spark side's unionAll of three
    materialize() results)."""
    return f"""
WITH triples AS (
{_profile_triples_sql()}
),
per_subject AS (
  SELECT subject,
         array_to_string(list_sort(list(DISTINCT predicate)), ' ') AS cset,
         count(*) AS n
  FROM triples GROUP BY subject
)
SELECT cset,
       CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(n) AS BIGINT) AS n_triples
FROM per_subject GROUP BY cset
"""


def kg_void_stats() -> str:
    """Twin of operators/kgstats.void_property_partition over the same
    three-stream union as kg_characteristic_sets."""
    return f"""
WITH triples AS (
{_profile_triples_sql()}
)
SELECT predicate,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subject) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT object) AS BIGINT) AS n_objects
FROM triples GROUP BY predicate
"""


def kg_class_partition() -> str:
    """Twin of operators/kgstats.void_class_partition over the same
    three-stream union (only kg_rdf_type contributes type triples)."""
    return f"""
WITH triples AS (
{_profile_triples_sql()}
)
SELECT object AS class,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subject) AS BIGINT) AS n_entities
FROM triples
WHERE predicate = '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>'
GROUP BY object
"""


def _clusters_over_pairs(pairs_sql: str) -> str:
    """Connected components (min reachable doc_id) over any (id_a,
    id_b) pair query — the recursive-CTE replay of operators/dedup.
    dup_clusters, parameterized by the pair source."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY node
"""


def dedup_keep_canonical() -> str:
    """Twin of operators/dedup.keep_canonical over MinHash-LSH
    clusters: per connected component keep the max-length(text) doc
    (min doc_id tiebreak) with the component size. row_number here
    replays the Spark side's shuffle-free min(struct(-score, id))
    argmax. MinHash pairs (not SimHash) so the bench does not re-pay
    dedup_clusters' SimHash candidate stage for a second query."""
    return f"""
WITH clusters AS (
{_clusters_over_pairs(dedup_minhash_lsh())}
),
ranked AS (
  SELECT d.doc_id, c.cluster_id,
         count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
         CAST(length(d.text) AS DOUBLE) AS score,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY length(d.text) DESC, d.doc_id ASC) AS rn
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT doc_id, cluster_id,
       CAST(cluster_size AS BIGINT) AS cluster_size, score
FROM ranked WHERE rn = 1
"""


def text_tfidf_topk(k: int = 3) -> str:
    """Twin of operators/text.tfidf_topk — linear idf (tf * N / df):
    one exact integer product + one IEEE division, so score and the
    ranking it induces are bit-identical across engines."""
    return f"""
WITH toks AS (
  SELECT doc_id, t.term
  FROM documents, unnest({_TOKENS}) AS t(term)
  WHERE t.term != ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS BIGINT) AS tf,
         CAST(dfreq.doc_freq AS BIGINT) AS doc_freq,
         CAST(tf.tf AS DOUBLE) * n.n_docs / dfreq.doc_freq AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                                    ORDER BY s DESC, term ASC) AS INT) AS rank
  FROM scored
)
SELECT doc_id, term, tf, doc_freq, round(s, 6) AS score, rank
FROM ranked WHERE rank <= {k}
"""


def text_ngram_counts(n: int = 2, k: int = 20) -> str:
    """Twin of operators/text.ngram_counts_topk: corpus n-gram top-k
    with multiplicity + distinct-doc counts, count-desc gram-asc."""
    concat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '), x -> x != '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, greatest(len(t) - {n - 1}, 0)),
             i -> {concat})) AS gram
  FROM toks
),
per_doc AS (
  SELECT doc_id, gram, count(*) AS tf FROM grams GROUP BY doc_id, gram
),
agg AS (
  SELECT gram,
         CAST(sum(tf) AS BIGINT) AS n_occurrences,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM per_doc GROUP BY gram
)
SELECT gram, n_occurrences, n_docs,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, gram ASC)
            AS INT) AS rank
FROM agg
ORDER BY n_occurrences DESC, gram ASC
LIMIT {k}
"""


def llm_length_histogram() -> str:
    """Twin of operators/text.length_histogram: power-of-two token-count
    buckets via integer floor(log2) = length(bin(n)) - 1."""
    return """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(coalesce(text, ''), ' '),
                         x -> x != '')) AS n
  FROM documents
),
bucketed AS (
  SELECT CASE WHEN n = 0 THEN 0
              ELSE 1 << (length(bin(n)) - 1) END AS bucket_lo,
         n
  FROM toks
)
SELECT CAST(bucket_lo AS BIGINT) AS bucket_lo,
       CAST(CASE WHEN bucket_lo = 0 THEN 0
                 ELSE bucket_lo * 2 - 1 END AS BIGINT) AS bucket_hi,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS total_tokens
FROM bucketed GROUP BY bucket_lo
"""


def text_length_quantiles() -> str:
    """Twin of operators/text.length_quantiles: exact interpolated
    quantiles (quantile_cont == Spark's percentile) over per-doc token
    counts, grouped by lang."""
    return """
WITH toks AS (
  SELECT lang,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              x -> x != '')) AS BIGINT) AS n
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       quantile_cont(n, 0.25) AS p25_tokens,
       quantile_cont(n, 0.5) AS p50_tokens,
       quantile_cont(n, 0.9) AS p90_tokens,
       max(n) AS max_tokens
FROM toks GROUP BY lang
"""


def text_quality_classifier(buckets: int = 4096) -> str:
    """Twin of operators/text.quality_classifier — same hashed
    unigram+bigram features, same deterministic integer weight table
    ((bucket·2654435761) mod 1999 − 999), all-int64 math."""
    w = f"({h64_sql('x')} % {buckets}) * 2654435761 % 1999 - 999"
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '), x -> x != '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id,
         t || list_transform(
             generate_series(1, greatest(len(t) - 1, 0)),
             i -> t[i] || ' ' || t[i+1]) AS f
  FROM toks
),
scored AS (
  SELECT doc_id,
         CAST(len(f) AS INT) AS n_features,
         CAST(coalesce(list_sum(list_transform(f, x -> {w})), 0) AS BIGINT)
             AS score_sum
  FROM feats
)
SELECT doc_id, n_features, score_sum,
       (n_features > 0 AND score_sum >= 0) AS keep
FROM scored
"""


def text_quality_gate(min_tokens: int = 50, max_tokens: int = 100_000,
                      min_mean_word_len: float = 3.0,
                      max_mean_word_len: float = 10.0,
                      max_symbol_ratio: float = 0.1,
                      min_unique_fraction: float = 0.2,
                      min_stopword_hits: int = 2) -> str:
    """Twin of operators/text.quality_gate — same cross-multiplied
    comparisons (no division), same fixed violation order, same
    LANG_PROFILES['en'] stop-word constant, same degenerate-input
    closure (NULL text coalesced to '', empty tokens dropped)."""
    stops = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    t = "list_filter(string_split(coalesce(text, ''), ' '), x -> x != '')"
    return f"""
WITH s AS (
  SELECT doc_id,
         len({t}) AS n_tok,
         length(replace(coalesce(text, ''), ' ', '')) AS non_space,
         len(list_distinct({t})) AS uniq,
         length(coalesce(text, '')) AS n_chars,
         len(regexp_extract_all(coalesce(text, ''), '[^A-Za-z0-9 ]'))
           AS symbols,
         len(list_intersect(list_distinct({t}), [{stops}])) AS stop_hits
  FROM documents
),
v AS (
  SELECT doc_id,
         concat_ws(',',
           CASE WHEN non_space < {min_mean_word_len} * n_tok
                  OR non_space > {max_mean_word_len} * n_tok
                THEN 'mean_word_len' END,
           CASE WHEN stop_hits < {min_stopword_hits} THEN 'stopwords' END,
           CASE WHEN symbols > {max_symbol_ratio} * n_chars
                THEN 'symbol_ratio' END,
           CASE WHEN uniq < {min_unique_fraction} * n_tok
                THEN 'unique_fraction' END,
           CASE WHEN n_tok < {min_tokens} OR n_tok > {max_tokens}
                THEN 'word_count' END
         ) AS violations
  FROM s
)
SELECT doc_id, (violations = '') AS keep, violations FROM v
"""


def events_funnel() -> str:
    """Twin of operators/events.funnel over (view, click, purchase):
    per stage, users whose earliest stage event is at-or-after their
    earliest qualifying previous-stage event."""
    return """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'view' AS stage, 1 AS stage_no,
       CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 'click', 2, CAST((SELECT count(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 'purchase', 3, CAST((SELECT count(*) FROM s3) AS BIGINT)
"""


def events_asof_join() -> str:
    """Twin of operators/events.asof_join via DuckDB's NATIVE ASOF
    JOIN — the strongest possible oracle: a first-class engine
    implementation of the semantics, not a replay of our plan. The
    right side is pre-deduped to one row per (user_id, ts) with the
    max (event_id, value), the same deterministic winner the Spark
    side's struct-max picks (ASOF is underspecified under ties)."""
    return """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
r AS (
  SELECT user_id, ts, event_id, value FROM (
    SELECT user_id, ts, event_id, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY event_id DESC, value DESC) AS rn
    FROM events WHERE event_type = 'view') t WHERE rn = 1
)
SELECT l.event_id, l.ts, l.user_id, l.event_type, l.value, l.props,
       r.ts AS asof_ts, r.event_id AS asof_event_id,
       r.value AS asof_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""
