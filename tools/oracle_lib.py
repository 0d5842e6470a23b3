"""Shared DuckDB-oracle SQL builders for __spark_entry__.oracle_sql().

Every fragment here is the single source of truth for a construction that
more than one oracle query embeds (the round-4 verdict's size audit):

- ``md5_int60`` — the repo-wide text→60-bit-int hash
  (hashfamily.md5_int60_col's SQL twin).
- ``closure`` / ``cluster_select`` — recursive reachability closure over a
  symmetric pair CTE, the ONE SQL twin of ops/graph.py
  connected_components (label = min reachable id), shared by all four
  dedup_cluster_* oracles.
- ``shingle_ctes`` — words → DISTINCT n-gram shingles (jaccard n=3,
  minhash n=3, decontaminate n=8 all build on it).
- ``jaccard_pair_ctes`` — shingles → thresholded jaccard ``pairs``
  (dedup_cluster_canonical, curate_corpus).
- ``minhash_cand_ctes`` — shingles → md5-seeded minhash signatures → LSH
  band buckets → ``cand``/``mh`` (dedup_minhash_lsh,
  dedup_cluster_minhash).
- ``simhash_fp_ctes`` — tokens → md5 bit votes → 60-bit fingerprints
  (simhash, dedup_cluster_simhash).
- ``lsh_bucket_ctes`` — embedding × seeded hyperplanes → per-table sign
  buckets → candidate pairs/probes (ann_lsh_topk, dedup_embedding,
  dedup_cluster_embedding).

Formulas MUST mirror bella_domify_spark/ops/{dedup,hashfamily,ann}.py
exactly — change them only together with their Spark twins (and re-run
tools/check_oracle.py).
"""

from __future__ import annotations


def md5_int60(expr: str) -> str:
    """('0x'||substr(md5(x),1,15))::BIGINT — 60 bits, ANSI-product-safe."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def closure(pair_cte: str) -> str:
    """Recursive reachability closure + min-label (needs WITH RECURSIVE)."""
    return f"""sym AS (
                SELECT id_a AS src, id_b AS dst FROM {pair_cte}
                UNION ALL
                SELECT id_b, id_a FROM {pair_cte}
            ),
            reach(node, r) AS (
                SELECT DISTINCT src, src FROM sym
                UNION
                SELECT reach.node, sym.dst FROM reach
                JOIN sym ON sym.src = reach.r
            ),
            lab AS (SELECT node, min(r) AS canonical_id FROM reach GROUP BY node)"""


def cluster_select(id_name: str) -> str:
    return f"""SELECT node AS {id_name}, canonical_id,
                   count(*) OVER (PARTITION BY canonical_id) AS cluster_size
            FROM lab"""


def shingle_ctes(n: int = 3, dedupe: bool = True) -> str:
    """words + word-``n``-gram shingles over the documents view
    (w[i:i+k] is a 1-based inclusive slice: k = n-1 spans n words) —
    mirrors dedup.word_shingles incl. its ``dedupe`` flag: DISTINCT
    shingles as CTE ``sh`` (default), or ALL instances as CTE ``si``."""
    k = n - 1
    distinct, alias = ("DISTINCT ", "sh") if dedupe else ("", "si")
    return f"""words AS (
                SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
                FROM documents
            ),
            {alias} AS (
                SELECT {distinct}doc_id AS id,
                       array_to_string(w[i:i+{k}], ' ') AS shingle
                FROM words, UNNEST(range(1, len(w) - {k - 1})) AS t(i)
            )"""


def shingle_instance_ctes(n: int = 8) -> str:
    """ALL n-gram shingle instances as CTE ``si`` (dup_span_stats)."""
    return shingle_ctes(n, dedupe=False)


def jaccard_pair_ctes(threshold: float = 0.2,
                      max_shingle_freq: int = 1000,
                      include_shingles: bool = True) -> str:
    """shingle_ctes(3) → thresholded jaccard ``pairs`` (dedup.jaccard_pairs
    defaults: n=3, stop-shingle cap 1000). ``include_shingles=False``
    emits only the tail (caller already defined words/sh — the
    dedup_recall composition)."""
    head = f"""{shingle_ctes(3)},
            """ if include_shingles else ""
    return f"""{head}sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
            freq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY shingle),
            shf AS (SELECT sh.* FROM sh JOIN freq USING (shingle) WHERE f <= {max_shingle_freq}),
            common AS (
                SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
                FROM shf a JOIN shf b USING (shingle)
                WHERE a.id < b.id GROUP BY a.id, b.id
            ),
            pairs AS (
                SELECT id_a, id_b
                FROM common
                JOIN sizes sa ON sa.id = id_a
                JOIN sizes sb ON sb.id = id_b
                WHERE n_common::DOUBLE / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
            )"""


def containment_pair_sql(threshold: float = 0.5,
                         max_shingle_freq: int = 1000,
                         min_shingles: int = 5) -> str:
    """Full SELECT for dedup.containment_pairs (directed shingle
    containment |A∩B|/|A| with a min-shingle floor on both sides) —
    same shingle/freq-cap CTEs as the jaccard oracle."""
    return f"""
        WITH {shingle_ctes(3)},
        sizes AS (
            SELECT id, count(*) AS n_sh FROM sh GROUP BY id
            HAVING count(*) >= {int(min_shingles)}
        ),
        freq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY shingle),
        shf AS (SELECT sh.* FROM sh JOIN freq USING (shingle)
                WHERE f <= {max_shingle_freq}),
        common AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
            FROM shf a JOIN shf b USING (shingle)
            WHERE a.id <> b.id GROUP BY a.id, b.id
        )
        SELECT id_a, id_b, n_common,
               sa.n_sh AS n_a,
               n_common::DOUBLE / sa.n_sh AS containment
        FROM common
        JOIN sizes sa ON sa.id = id_a
        JOIN sizes sb ON sb.id = id_b
        WHERE n_common::DOUBLE / sa.n_sh >= {threshold}
    """


def minhash_cand_ctes(minhash_params_sql: str,
                      include_shingles: bool = True) -> str:
    """shingles → md5-seeded minhash (64 hashes) → 16 bands × 4 rows LSH
    buckets → DISTINCT candidate pairs. Exposes ``mh`` (id, i, mh) for the
    estimated-jaccard verification and ``cand`` (id_a, id_b). Mirrors
    dedup.minhash_signatures + minhash_lsh_pairs defaults.
    ``include_shingles=False`` emits only the tail (shared words/sh)."""
    head = f"""{shingle_ctes(3)},
            """ if include_shingles else ""
    return f"""{head}xs AS (
                SELECT id,
                       {md5_int60('shingle')}
                           % 2147483647 AS x
                FROM sh
            ),
            mh AS (
                SELECT id, i, min((a * x + b) % 2147483647) AS mh
                FROM xs CROSS JOIN {minhash_params_sql}
                GROUP BY id, i
            ),
            sig AS (SELECT id, list(mh ORDER BY i) AS sig FROM mh GROUP BY id),
            banded AS (
                SELECT id, band,
                       md5(array_to_string(sig[band*4+1 : band*4+4], ',')) AS bucket
                FROM sig, UNNEST(range(0, 16)) AS t(band)
            ),
            cand AS (
                SELECT DISTINCT a.id AS id_a, b.id AS id_b
                FROM banded a JOIN banded b USING (band, bucket)
                WHERE a.id < b.id
            )"""


def simhash_fp_ctes(fp_alias: str = "sh") -> str:
    """tokens → per-bit md5 sign votes → 60-bit fingerprint CTE ``fp``
    with the fingerprint column named ``fp_alias`` (dedup.simhash)."""
    return f"""tok AS (
                SELECT doc_id AS id, t.tok
                FROM documents,
                     UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t(tok)
                WHERE t.tok <> ''
            ),
            xs AS (
                SELECT id, {md5_int60('tok')} AS x
                FROM tok
            ),
            votes AS (
                SELECT id, b,
                       sum(CASE WHEN ((x >> b) & 1) = 1 THEN 1 ELSE -1 END) AS v
                FROM xs, UNNEST(range(0, 60)) AS t(b)
                GROUP BY id, b
            ),
            fp AS (
                SELECT id,
                       sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)
                           ::BIGINT AS {fp_alias}
                FROM votes GROUP BY id
            )"""


def lsh_bucket_ctes(lsh_planes_sql: str) -> str:
    """``v`` (vec_id, e DOUBLE[]) × seeded hyperplanes → per-table sign
    buckets ``vbuck`` (ops/ann.py hyperplane LSH). The caller supplies the
    ``v`` CTE (plain embeddings, or the perturbed near-dup augmentation)
    and the candidate join over ``vbuck``."""
    return f"""vdot AS (
                SELECT vec_id, t, p, sum(e[d + 1] * c) AS dp
                FROM v, {lsh_planes_sql}
                GROUP BY vec_id, t, p
            ),
            vbuck AS (
                SELECT vec_id, t,
                       sum(CASE WHEN dp > 0 THEN (1::BIGINT << p) ELSE 0 END)
                           ::BIGINT AS bucket
                FROM vdot GROUP BY vec_id, t
            )"""


#: embeddings + 20 perturbed near-dup twins — the dedup_embedding /
#: dedup_cluster_embedding input (mirrors ops/ann.py's gate augmentation)
EMBEDDING_AUGMENTED_V = """v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
                UNION ALL
                SELECT vec_id + 100000,
                       list_transform(embedding::DOUBLE[],
                                      x -> x * 1.001 + 0.003)
                FROM embeddings WHERE vec_id < 20
            )"""

#: candidate pairs from same-table same-bucket collisions (near-dup form)
LSH_PAIR_CAND = """cand AS (
                SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
                FROM vbuck a JOIN vbuck b ON a.t = b.t AND a.bucket = b.bucket
                WHERE a.vec_id < b.vec_id
            )"""


def span_removal_ctes(n: int = 8) -> str:
    """words + positional shingle instances + duplicated-span coverage
    (dedup.remove_dup_spans): terminal CTE ``cov`` = (id, p, word, c)
    where c > 0 means word position p is covered by a removable span
    instance (a duplicated n-gram occurrence that is not the global
    first). Interval-diff (+1/-1) coverage, mirroring the Spark side."""
    k = n - 1
    return f"""words AS (
                SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w
                FROM documents
            ),
            sip AS (
                SELECT doc_id AS id, i AS pos,
                       array_to_string(w[i:i+{k}], ' ') AS shingle
                FROM words, UNNEST(range(1, len(w) - {k - 1})) AS t(i)
            ),
            marked AS (
                SELECT id, pos,
                       row_number() OVER (PARTITION BY shingle
                                          ORDER BY id, pos) AS rn,
                       count(*) OVER (PARTITION BY shingle) AS occ
                FROM sip
            ),
            removable AS (
                SELECT id, pos FROM marked WHERE occ >= 2 AND rn > 1
            ),
            deltas AS (
                SELECT id, p, sum(d)::BIGINT AS d FROM (
                    SELECT id, pos AS p, 1 AS d FROM removable
                    UNION ALL
                    SELECT id, pos + {n} AS p, -1 AS d FROM removable)
                GROUP BY id, p
            ),
            wp AS (
                SELECT doc_id AS id, i AS p, w[i] AS word
                FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
            ),
            cov AS (
                SELECT wp.id, wp.p, wp.word,
                       sum(COALESCE(d.d, 0)) OVER (
                           PARTITION BY wp.id ORDER BY wp.p) AS c
                FROM wp LEFT JOIN deltas d
                    ON d.id = wp.id AND d.p = wp.p
            )"""


def kmeans_ctes(n_clusters: int = 8, iters: int = 2,
                scale: int = 1_000_000) -> str:
    """Integer-exact Lloyd's k-means over the embeddings view
    (ann.kmeans_assign): quantized exploded coordinates ``qe``, seed
    centroids ``se0``, then per-iteration assign/update CTE chains.
    Terminal CTE ``dF`` holds (id, c_id, dist2) under the final
    centroids; the caller QUALIFYs the winner. ``//`` truncates toward
    zero, matching Spark's ``div``."""
    parts = [f"""qe AS (
                SELECT vec_id AS id, i AS pos,
                       floor(embedding[i]::DOUBLE * {scale}.0)::BIGINT AS x
                FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
            ),
            seed_ids AS (
                SELECT id, row_number() OVER (ORDER BY id) - 1 AS c_id
                FROM (SELECT DISTINCT id FROM qe ORDER BY id
                      LIMIT {n_clusters})
            ),
            se0 AS (
                SELECT c_id, pos, x AS cx FROM qe JOIN seed_ids USING (id)
            )"""]
    for r in range(iters):
        parts.append(f"""d{r} AS (
                SELECT qe.id, s.c_id,
                       sum((qe.x - s.cx) * (qe.x - s.cx))::BIGINT AS dist2
                FROM qe JOIN se{r} s USING (pos) GROUP BY qe.id, s.c_id
            ),
            w{r} AS (
                SELECT id, c_id FROM d{r}
                QUALIFY row_number() OVER (PARTITION BY id
                                           ORDER BY dist2, c_id) = 1
            ),
            m{r} AS (
                SELECT w.c_id, qe.pos,
                       sum(qe.x)::BIGINT // count(*)::BIGINT AS cx
                FROM w{r} w JOIN qe USING (id) GROUP BY w.c_id, qe.pos
            ),
            se{r + 1} AS (
                SELECT c_id, pos, cx FROM m{r}
                UNION ALL
                SELECT s.c_id, s.pos, s.cx FROM se{r} s
                WHERE s.c_id NOT IN (SELECT DISTINCT c_id FROM m{r})
            )""")
    parts.append(f"""dF AS (
                SELECT qe.id, s.c_id,
                       sum((qe.x - s.cx) * (qe.x - s.cx))::BIGINT AS dist2
                FROM qe JOIN se{iters} s USING (pos)
                GROUP BY qe.id, s.c_id
            )""")
    return ",\n            ".join(parts)


def pagerank_ctes(iters: int = 3, scale: int = 10 ** 12) -> str:
    """Integer-exact PageRank over the ``pairs`` CTE (graph.pagerank twin):
    symmetrized edges ``sym2``, degrees ``degt``, scalar base table
    ``bb``, then per-iteration contribution/rank CTE chains. Terminal CTE
    ``pr{iters}``; ``//`` truncates like Spark's ``div`` (all operands
    nonnegative). Every sum casts back to BIGINT (DuckDB sums to HUGEINT,
    Spark stays int64)."""
    parts = [f"""sym2 AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs
            ),
            degt AS (SELECT src, count(*) AS deg FROM sym2 GROUP BY src),
            bb AS (SELECT {scale} // count(*) AS r0,
                          ((3 * {scale}) // 20) // count(*) AS base
                   FROM documents),
            pr0 AS (SELECT doc_id AS node, bb.r0 AS rank
                    FROM documents CROSS JOIN bb)"""]
    for k in range(1, iters + 1):
        parts.append(f"""c{k} AS (
                SELECT e.dst AS node, sum(r.rank // d.deg)::BIGINT AS c
                FROM sym2 e JOIN degt d ON d.src = e.src
                JOIN pr{k - 1} r ON r.node = e.src
                GROUP BY e.dst
            ),
            pr{k} AS (
                SELECT p.node,
                       (bb.base + (17 * COALESCE(c.c, 0)) // 20)::BIGINT
                           AS rank
                FROM pr0 p CROSS JOIN bb
                LEFT JOIN c{k} c USING (node)
            )""")
    return ",\n            ".join(parts)


def cooccurrence_pair_ctes(n: int = 3, min_common: int = 2,
                           max_shingle_freq: int = 20) -> str:
    """shingle_ctes(n) → shared-rare-shingle candidate ``pairs``
    (dedup.cooccurrence_pairs twin, n_common carried)."""
    return f"""{shingle_ctes(n)},
            cfreq AS (SELECT shingle, count(*) AS f FROM sh GROUP BY shingle),
            cshf AS (SELECT sh.* FROM sh JOIN cfreq USING (shingle)
                     WHERE f <= {int(max_shingle_freq)}),
            pairs AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       count(*)::BIGINT AS n_common
                FROM cshf a JOIN cshf b USING (shingle)
                WHERE a.id < b.id GROUP BY a.id, b.id
                HAVING count(*) >= {int(min_common)}
            )"""


def link_prediction_sql(max_center_deg: int = 1000,
                        min_common: int = 1) -> str:
    """Tail SELECT for graph.link_prediction over the ``pairs`` CTE
    (common-neighbor candidates among non-edges, hub-capped wedge
    centers, floor-e9 neighborhood Jaccard)."""
    return f"""
            lsym AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs
            ),
            ldeg AS (SELECT src, count(*) AS deg FROM lsym GROUP BY src),
            lnb AS (
                SELECT s.src AS w, s.dst AS n
                FROM lsym s JOIN ldeg d ON d.src = s.src
                WHERE d.deg <= {int(max_center_deg)}
            ),
            lcand AS (
                SELECT x.n AS id_a, y.n AS id_b, count(*) AS n_common
                FROM lnb x JOIN lnb y ON x.w = y.w
                WHERE x.n < y.n
                GROUP BY x.n, y.n
                HAVING count(*) >= {int(min_common)}
            ),
            lnon AS (
                SELECT c.* FROM lcand c
                WHERE NOT EXISTS (SELECT 1 FROM pairs p
                                  WHERE p.id_a = c.id_a
                                    AND p.id_b = c.id_b)
            )
            SELECT n.id_a, n.id_b, n.n_common::BIGINT AS n_common,
                   da.deg::BIGINT AS deg_a, db.deg::BIGINT AS deg_b,
                   floor(n.n_common::DOUBLE
                         / (da.deg + db.deg - n.n_common)::DOUBLE
                         * 1e9)::BIGINT AS nb_jaccard_e9
            FROM lnon n
            JOIN ldeg da ON da.src = n.id_a
            JOIN ldeg db ON db.src = n.id_b"""


def walk_ctes(iters: int = 3) -> str:
    """Power-iteration walk counts over the ``pairs`` CTE
    (graph.walk_centrality twin): symmetrize, then ``iters`` unrolled
    message rounds; HUGEINT accumulators pair with Spark's
    DECIMAL(38,0)."""
    parts = ["""wsym AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs
            )""",
             """wx1 AS (SELECT dst AS id, count(*)::DECIMAL(38,0) AS s
                       FROM wsym GROUP BY dst)"""]
    # DECIMAL(38,0), not HUGEINT: DuckDB's sum(HUGEINT) silently returns
    # DOUBLE; sum(DECIMAL(38,0)) stays exact decimal, matching Spark
    for i in range(2, iters + 1):
        parts.append(f"""wx{i} AS (
                SELECT e.dst AS id, sum(x.s)::DECIMAL(38,0) AS s
                FROM wsym e JOIN wx{i - 1} x ON x.id = e.src
                GROUP BY e.dst
            )""")
    return ",\n            ".join(parts)


def kcore_ctes(k: int = 2, rounds: int = 3) -> str:
    """k-core peel over the ``pairs`` CTE (graph.kcore_peel twin):
    unrolled round-per-CTE peeling — recursive SQL cannot aggregate over
    its own recursive table, so the fixed round count is mirrored
    CTE-for-CTE. Terminal CTEs ``kd{rounds}`` (degrees entering the
    final peel) and ``ka{rounds}`` (survivors)."""
    parts = [f"""ksym AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs
            ),
            ka0 AS (SELECT DISTINCT src FROM ksym)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""kd{r} AS (
                SELECT s.src, count(*) AS deg
                FROM ksym s
                JOIN ka{r - 1} a ON a.src = s.src
                JOIN ka{r - 1} b ON b.src = s.dst
                GROUP BY s.src
            ),
            ka{r} AS (SELECT src FROM kd{r} WHERE deg >= {int(k)})""")
    return ",\n            ".join(parts)


def lpa_ctes(rounds: int = 3) -> str:
    """Synchronous modal label propagation over the ``pairs`` CTE
    (graph.lpa_communities twin): unrolled round-per-CTE — the fixed
    horizon is both the recursion workaround and the determinism
    guarantee (sync LPA can oscillate). Modal pick = row_number over
    (count DESC, label ASC). Terminal CTE ``ll{rounds}`` (node, lab)."""
    parts = [f"""lsym AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs
            ),
            ll0 AS (SELECT DISTINCT src AS node, src AS lab FROM lsym)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""lm{r} AS (
                SELECT s.src, l.lab, count(*) AS c
                FROM lsym s JOIN ll{r - 1} l ON l.node = s.dst
                GROUP BY s.src, l.lab
            ),
            ll{r} AS (
                SELECT src AS node, lab
                FROM (SELECT src, lab,
                             row_number() OVER (PARTITION BY src
                                                ORDER BY c DESC, lab) AS rn
                      FROM lm{r})
                WHERE rn = 1
            )""")
    return ",\n            ".join(parts)


def ball_ctes(radius: int = 2) -> str:
    """r-hop ball over the ``pairs`` CTE (graph.neighborhood_sizes
    twin): unrolled hop-per-CTE, self excluded, DISTINCT per hop.
    Terminal CTE ``nb{radius}`` (src, dst)."""
    parts = [f"""nsym AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b, id_a FROM pairs
            ),
            nb1 AS (SELECT DISTINCT src, dst FROM nsym)"""]
    for r in range(2, radius + 1):
        parts.append(f"""nb{r} AS (
                SELECT DISTINCT src, dst FROM (
                    SELECT src, dst FROM nb{r - 1}
                    UNION ALL
                    SELECT b.src, e.dst
                    FROM nb{r - 1} b JOIN nsym e ON e.src = b.dst
                    WHERE b.src != e.dst
                )
            )""")
    return ",\n            ".join(parts)
