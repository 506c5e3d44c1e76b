#!/usr/bin/env python3
"""Oracle-SQL development harness: candidate DuckDB SQL per query, compared
against the Verify parquet outputs with the same canonicalization as
check_oracle.py. Used to validate SQL before baking it into SparkEntry.

Usage: dev_oracles.py <sfDir> <outDir> [query ...]
"""
import sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
FIX = "/root/repo/target/verify_fixtures"
con = duckdb.connect()
for tbl in ["region","nation","customer","supplier","part","orders",
            "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sfdir}/{tbl}.parquet')")

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = f"{v!r}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out)

ORACLES = {}

ORACLES["q22_langid"] = f"""
WITH d AS (
  SELECT doc_id, lang AS labeled_lang,
    list_slice(regexp_split_to_array(lower(coalesce(text,'')), '\\s+'), 1, 200) AS toks
  FROM documents),
s AS (SELECT doc_id, labeled_lang,
  len(list_filter(['the','and','of','to','in','is','a'], m -> list_contains(toks, m))) AS n_en,
  len(list_filter(['der','die','und','das','ist','nicht','ein'], m -> list_contains(toks, m))) AS n_de,
  len(list_filter(['el','la','de','que','y','los','una'], m -> list_contains(toks, m))) AS n_es,
  len(list_filter(['le','la','les','des','est','une','et'], m -> list_contains(toks, m))) AS n_fr
 FROM d)
SELECT doc_id, labeled_lang,
 CASE WHEN greatest(n_en,n_de,n_es,n_fr) = 0 THEN 'unknown'
      WHEN n_fr >= n_en AND n_fr >= n_de AND n_fr >= n_es THEN 'fr'
      WHEN n_es >= n_en AND n_es >= n_de THEN 'es'
      WHEN n_en >= n_de THEN 'en'
      ELSE 'de' END AS predicted_lang
FROM s
"""

ORACLES["q16_knn_brute"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS nv FROM embeddings),
s AS (SELECT query_id, neighbor_id, list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(nv AS DOUBLE[])) AS cosine
      FROM q, c WHERE query_id <> neighbor_id),
r AS (SELECT query_id, neighbor_id, cosine,
        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
      FROM s)
SELECT query_id, neighbor_id, round(cosine, 4) AS cosine, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 5
"""

ORACLES["q25_kg_triples"] = f"""
SELECT t.subj AS subj, t.pred AS pred, t.obj AS obj, t.confidence AS confidence,
       url, day, t.chunk_id AS chunk_id, t.sentence AS sentence,
       'det-1.0.0' AS extractor_version
FROM (SELECT url, day, unnest(triples) AS t FROM read_parquet('{FIX}/extractions/*.parquet'))
"""

ORACLES["q26_kg_concepts"] = f"""
WITH m AS (
  SELECT url, u.chunk_id AS chunk_id, u.name AS name, u.description AS description,
         u.confidence AS confidence
  FROM (SELECT url, unnest(mentions) AS u FROM read_parquet('{FIX}/extractions/*.parquet'))),
w AS (
  SELECT lower(name) AS k, name, url, chunk_id, description, confidence,
    ROW_NUMBER() OVER (PARTITION BY lower(name)
      ORDER BY confidence DESC, name ASC, url ASC, chunk_id ASC, description ASC) AS rn,
    COUNT(*) OVER (PARTITION BY lower(name)) AS mention_count
  FROM m)
SELECT 'web:' || name AS id, name, description, 'web' AS domain, url AS source_id,
  chunk_id AS source_location, confidence, mention_count, CAST(384 AS INT) AS embedding_dim,
  'feature-hash-384-v1' AS embedding_model, 'det-1.0.0' AS extractor_version
FROM w WHERE rn = 1
"""

ORACLES["q31_rules_explicit"] = f"""
WITH sent AS (SELECT text, source_id FROM read_parquet('{FIX}/rule_sentences/*.parquet')),
cand AS (SELECT text, __n FROM read_parquet('{FIX}/rule_mention_names/*.parquet')),
dict AS (SELECT id AS concept_id, lower(name) AS __n
         FROM read_parquet('{FIX}/concepts_lite/*.parquet')),
linked AS (SELECT c.text, d.concept_id FROM cand c JOIN dict d USING (__n)),
agg AS (
  SELECT s.text, s.source_id,
    coalesce(array_to_string(list_sort(list(DISTINCT l.concept_id)
      FILTER (l.concept_id IS NOT NULL)), ','), '') AS concept_ids
  FROM sent s LEFT JOIN linked l ON s.text = l.text
  GROUP BY s.text, s.source_id)
SELECT 'rule:' || substr(sha256(text), 1, 16) AS id, text, 'web' AS domain, source_id,
  concept_ids,
  CASE WHEN regexp_matches(lower(text), '\\bnever\\b|\\bdo not\\b|\\bdon''t\\b|\\bavoid\\b')
       THEN 'prohibition' ELSE 'requirement' END AS category,
  CAST(0.8 AS DOUBLE) AS confidence
FROM agg
"""

TEMPLATES = {
  "USES": "{source} builds on {target}; keep {target} available wherever {source} runs.",
  "REQUIRES": "{source} cannot operate without {target}; provision {target} first.",
  "CONTAINS": "{source} encompasses {target}; changes to {target} stay within {source}.",
  "IMPLEMENTS": "{source} realizes {target}; keep their contracts aligned.",
  "REFINES": "{source} specializes {target}; prefer {source} where its assumptions hold.",
  "PART_OF": "{source} is a component of {target}; version them together.",
  "SIMILAR_TO": "{source} and {target} are interchangeable in many designs; compare before choosing.",
  "ALTERNATIVE_TO": "{source} replaces {target} in some designs; document the trade-off.",
  "SUPPORTS": "{source} strengthens the case for {target}.",
  "CHALLENGES": "{source} works against {target}; mitigate the tension.",
  "CONTRADICTS": "{source} is incompatible with {target}; never assume both.",
  "BELONGS_TO": "{source} belongs to {target}.",
  "INSTANCE_OF": "{source} is an instance of {target}.",
  "RELATED_TO": "{source} relates to {target}; consider them together.",
}
tvals = ",".join("('%s','%s')" % (k, v.replace("'", "''")) for k, v in sorted(TEMPLATES.items()))

ORACLES["q32_rules_derived"] = f"""
WITH e AS (SELECT source_id, target_id, relation_type, confidence,
     ROW_NUMBER() OVER (PARTITION BY source_id, target_id
       ORDER BY confidence DESC, relation_type ASC) AS rn
     FROM read_parquet('{FIX}/pruned_edges/*.parquet')),
u AS (SELECT * FROM e WHERE rn = 1),
n AS (SELECT id, name FROM read_parquet('{FIX}/concepts_lite/*.parquet')),
t(relation_type, template) AS (VALUES {tvals}),
x AS (SELECT u.source_id, u.target_id, u.confidence, sn.name AS sn, tn.name AS tn,
        coalesce(t.template, '{{source}} relates to {{target}}.') AS template
      FROM u JOIN n sn ON u.source_id = sn.id JOIN n tn ON u.target_id = tn.id
      LEFT JOIN t ON u.relation_type = t.relation_type)
SELECT 'drule:' || substr(sha256(source_id || '|' || target_id), 1, 16) AS id,
  replace(replace(template, '{{source}}', sn), '{{target}}', tn) AS text,
  'web' AS domain, source_id || ',' || target_id AS concept_ids,
  'derived' AS category, confidence
FROM x
"""

ORACLES["q34_bfs_neighborhood"] = f"""
WITH e AS (SELECT source_id, target_id FROM read_parquet('{FIX}/pruned_edges/*.parquet')),
und AS (SELECT source_id AS src, target_id AS dst FROM e
        UNION SELECT target_id, source_id FROM e),
d1 AS (SELECT DISTINCT dst AS id FROM und WHERE src = 'web:The Platform'),
d2 AS (SELECT DISTINCT dst AS id FROM und WHERE src IN (SELECT id FROM d1)),
alln AS (SELECT 'web:The Platform' AS id, CAST(1.0 AS DOUBLE) AS score
        UNION ALL SELECT id, 0.5 FROM d1
        UNION ALL SELECT id, 0.25 FROM d2)
SELECT id, MAX(score) AS score FROM alln GROUP BY id
"""

# q29 PPR: generated 25-iteration chain over the pruned_edges fixture
ppr_iters = []
prev = "r0"
for i in range(1, 26):
    cur = f"r{i}"
    ppr_iters.append(f"""{cur} AS MATERIALIZED (
  SELECT p.id,
    0.85 * coalesce(c.inflow, 0.0) + 0.15 * p.pers AS rank
  FROM pers p LEFT JOIN (
    SELECT a.dst AS id, SUM(r.rank * a.p) AS inflow
    FROM adj a JOIN {prev} r ON r.id = a.src GROUP BY a.dst) c USING (id))""")
    prev = cur

ORACLES["q29_ppr"] = f"""
WITH e AS (SELECT source_id, target_id, confidence
           FROM read_parquet('{FIX}/pruned_edges/*.parquet')),
und AS (SELECT source_id AS src, target_id AS dst, CAST(confidence AS DOUBLE) AS w FROM e
        UNION ALL SELECT target_id, source_id, CAST(confidence AS DOUBLE) FROM e),
outw AS (SELECT src, SUM(w) AS wout FROM und GROUP BY src),
adj AS MATERIALIZED (SELECT und.src, und.dst, und.w / outw.wout AS p FROM und JOIN outw USING (src)),
nodes AS (SELECT DISTINCT src AS id FROM adj),
pers AS MATERIALIZED (SELECT id, CASE WHEN id = 'web:The Platform' THEN 1.0 ELSE 0.0 END AS pers FROM nodes),
r0 AS MATERIALIZED (SELECT id, pers AS rank FROM pers),
{",".join(ppr_iters)}
SELECT id, round(rank, 6) AS rank FROM r25 WHERE rank > 1e-8
"""

fails = 0
for name, sql in sorted(ORACLES.items()):
    if only and name not in only:
        continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchall()
        got_cols = [d[0] for d in con.description]
        exp = con.execute(sql).fetchall()
        exp_cols = [d[0] for d in con.description]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: schema spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            fails += 1
            continue
        g, e = canon(got, got_cols), canon(exp, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}")
            onlyg = [x for x in g if x not in set(e)][:2]
            onlye = [x for x in e if x not in set(g)][:2]
            print(f"  spark-only: {onlyg}\n  oracle-only: {onlye}")
            fails += 1
        elif g != e:
            diff = [(a, b) for a, b in zip(g, e) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
            fails += 1
        else:
            print(f"OK   {name}: {len(g)} rows")
    except Exception as ex:
        print(f"ERR  {name}: {ex}")
        fails += 1
sys.exit(1 if fails else 0)
