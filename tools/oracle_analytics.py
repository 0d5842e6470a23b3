"""Oracle SQL for the analytics-layer queries (lakehouse, experiment
readouts, curation classifiers, graph ranking, sketches, multimodal,
dedup-adjacent) — moved VERBATIM out of __spark_entry__.oracle_sql()
(round-6 entry-file diet, VERDICT r5 task 7; zero behavior change,
asserted at extraction time by a materialized-dict equality check and
standing by the exact-hash check_oracle runs).

Keys must match __spark_entry__.queries(); __spark_entry__.oracle_sql()
merges this dict BEFORE composing its derived entries (ann_recall reads
ann_ivf_topk from here). The f-string helpers live beside their Spark
operators (ops/*.py, tools/oracle_lib.py) so the two engines' formulas
cannot drift.
"""

from __future__ import annotations


def entries() -> dict[str, str]:
    from bella_domify_spark.ops.analyze import (analyze_oracle_sql,
                                                qte_oracle_sql
                                                as _qte_oracle_sql)
    from bella_domify_spark.ops.ann import (ivfpq_oracle_sql
                                            as _ivfpq_oracle_sql,
                                            planes_values_sql,
                                            pq_oracle_sql as _pq_oracle_sql)
    from bella_domify_spark.ops.classifier import (classifier_feats_sql,
                                                   classifier_weight_expr)
    from bella_domify_spark.ops.dsir import dsir_lambda_sql
    from bella_domify_spark.ops.lakehouse import (compact_oracle_ctes,
                                                  prune_oracle_sql
                                                  as _prune_oracle_sql,
                                                  zorder_oracle_ctes)
    from bella_domify_spark.ops.bpe import (bpe_encode_oracle_sql,
                                            bpe_oracle_sql)
    from bella_domify_spark.ops.boilerplate import (boilerplate_oracle_sql
                                                    as _bp_oracle_sql,
                                                    boilerplate_strip_oracle_sql
                                                    as _bp_strip_oracle_sql)
    from bella_domify_spark.ops.webfilter import (c4_oracle_sql
                                                  as _c4_oracle_sql,
                                                  encoding_oracle_sql
                                                  as _encoding_oracle_sql,
                                                  secrets_oracle_sql
                                                  as _secrets_oracle_sql)
    from bella_domify_spark.ops.analyze import (expectations_oracle_sql
                                                as _expectations_oracle_sql)
    from bella_domify_spark.ops.retrieval import (discount_values_sql,
                                                  queries_values_sql,
                                                  rbo_suffix_sql)
    from bella_domify_spark.ops.textstats import (lexical_diversity_oracle_sql
                                                  as _lexdiv_oracle_sql)
    from bella_domify_spark.ops.curate import (k_anonymity_oracle_sql
                                               as _kanon_oracle_sql)
    from bella_domify_spark.ops.analyze import (rater_kappa_oracle_sql
                                                as _kappa_oracle_sql)
    from bella_domify_spark.ops.transcript import (context_budget_oracle_sql
                                                   as _ctx_oracle_sql)
    from bella_domify_spark.ops.ann import (sq_error_oracle_sql
                                            as _sq_oracle_sql)
    from bella_domify_spark.ops.analyze import (gini_oracle_sql
                                                as _gini_oracle_sql,
                                                mann_kendall_oracle_sql
                                                as _mk_oracle_sql)
    from bella_domify_spark.ops.textstats import (heaps_oracle_sql
                                                  as _heaps_oracle_sql,
                                                  script_mix_oracle_sql
                                                  as _script_oracle_sql,
                                                  source_temperature_oracle_sql
                                                  as _stemp_oracle_sql)
    from bella_domify_spark.ops.curate import (l_diversity_oracle_sql
                                               as _ldiv_oracle_sql,
                                               t_closeness_oracle_sql
                                               as _tclose_oracle_sql)
    from bella_domify_spark.ops.textstats import (char_entropy_oracle_sql
                                                  as _chent_oracle_sql,
                                                  fertility_oracle_sql
                                                  as _fert_oracle_sql,
                                                  negative_sampling_oracle_sql
                                                  as _ns_oracle_sql,
                                                  zipf_oracle_sql
                                                  as _zipf_oracle_sql,
                                                  vocab_delta_oracle_sql
                                                  as _vdelta_oracle_sql,
                                                  source_jsd_oracle_sql
                                                  as _sjsd_oracle_sql,
                                                  vocab_overlap_oracle_sql
                                                  as _vocab_oracle_sql,
                                                  hill_oracle_sql
                                                  as _hill_oracle_sql,
                                                  freq_spectrum_oracle_sql
                                                  as _fspec_oracle_sql)
    from bella_domify_spark.ops.dedup import (ppjoin_oracle_sql
                                              as _ppjoin_oracle_sql)
    from bella_domify_spark.ops.ann import (kcenter_oracle_sql
                                            as _kcenter_oracle_sql)
    from bella_domify_spark.ops.retrieval import (postings_oracle_sql
                                                  as _postings_oracle_sql)
    from bella_domify_spark.ops.curate import (apportion_oracle_sql
                                               as _apportion_oracle_sql)
    from bella_domify_spark.ops.temporal import (interarrival_oracle_sql
                                                 as _ia_oracle_sql,
                                                 transition_entropy_oracle_sql
                                                 as _te_oracle_sql,
                                                 weekday_oracle_sql
                                                 as _wd_oracle_sql,
                                                 conversion_lag_oracle_sql
                                                 as _clag_oracle_sql,
                                                 survival_oracle_sql
                                                 as _surv_oracle_sql)
    from bella_domify_spark.ops.analyze import (benford_oracle_sql
                                                as _benford_oracle_sql,
                                                fences_oracle_sql
                                                as _fences_oracle_sql,
                                                trimmed_mean_oracle_sql
                                                as _tmean_oracle_sql,
                                                meta_mi_oracle_sql
                                                as _meta_mi_oracle_sql,
                                                props_keys_oracle_sql
                                                as _props_oracle_sql,
                                                pareto_oracle_sql
                                                as _pareto_oracle_sql,
                                                type_affinity_oracle_sql
                                                as _taff_oracle_sql,
                                                ess_oracle_sql
                                                as _ess_oracle_sql,
                                                ks_oracle_sql
                                                as _ks_oracle_sql,
                                                theil_sen_oracle_sql
                                                as _theil_oracle_sql,
                                                cusum_oracle_sql
                                                as _cusum_oracle_sql)
    from bella_domify_spark.ops.textstats import (flesch_oracle_sql
                                                  as _flesch_oracle_sql)
    from bella_domify_spark.ops.analyze import (anomaly_oracle_sql
                                                as _anomaly_oracle_sql,
                                                srm_oracle_sql
                                                as _srm_oracle_sql)
    from bella_domify_spark.ops.temporal import (concurrency_oracle_sql
                                                 as _concurrency_oracle_sql,
                                                 late_oracle_sql
                                                 as _late_oracle_sql)
    from bella_domify_spark.ops.graph import (modularity_oracle_sql
                                              as _modularity_oracle_sql,
                                              assortativity_oracle_sql
                                              as _assort_oracle_tail)
    from bella_domify_spark.ops.textstats import (pmi_oracle_sql
                                                  as _pmi_oracle_sql)
    from tools.oracle_lib import (
        ball_ctes,
        closure as _closure,
        containment_pair_sql,
        cooccurrence_pair_ctes,
        jaccard_pair_ctes,
        kcore_ctes,
        link_prediction_sql,
        lpa_ctes,
        kmeans_ctes,
        md5_int60,
        minhash_cand_ctes,
        pagerank_ctes,
        walk_ctes,
    )
    from bella_domify_spark.ops.hashfamily import params_values_sql
    from bella_domify_spark.ops.sketches import (CMS_D, CMS_W,
                                                 HLL_NUMERATOR,
                                                 bottomk_oracle_sql
                                                 as _bk_oracle_tail)

    # same locals as __spark_entry__.oracle_sql() (the moved entries
    # interpolate them; definitions duplicated, constants imported)
    jaccard_cluster_ctes = f"""{jaccard_pair_ctes()},
            {_closure("pairs")}"""
    hll_num = repr(HLL_NUMERATOR)  # repr round-trips float64 exactly
    cms_params = params_values_sql(CMS_D)  # the shared hash family

    # BM25 as a reusable SQL block: the bm25_topk entry verbatim, also
    # composed by hybrid_rrf (so the lexical ranking cannot drift between
    # the standalone query and the fusion)
    bm25_sql = f"""
            WITH toks AS (
                SELECT doc_id AS id, t.term
                FROM documents,
                     UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t(term)
                WHERE t.term <> ''
            ),
            tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
            dl AS (SELECT id, sum(tf)::BIGINT AS dl FROM tf GROUP BY id),
            corpus AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl
                       FROM dl),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            qterms AS (SELECT * FROM {queries_values_sql()}),
            contrib AS (
                -- constants are the Python-folded exact binary fractions:
                -- 2.25 = 1.0+k1, 0.25 = 1.0-b (k1=1.25, b=0.75)
                SELECT qterms.query_id, tf.id,
                       floor(
                           floor(ln((c.n_docs - dft.df + 0.5)
                                    / (dft.df + 0.5) + 1.0) * 1e12)::DOUBLE
                           * ((tf.tf * 2.25)
                              / (tf.tf + 1.25 * (0.25 + 0.75 *
                                  (dl.dl / (c.sum_dl::DOUBLE / c.n_docs)))))
                           / 1e3
                       )::DECIMAL(20,0) AS c_e9
                FROM tf
                JOIN qterms USING (term)
                JOIN dft USING (term)
                JOIN dl ON dl.id = tf.id
                CROSS JOIN corpus c
            ),
            scores AS (SELECT query_id, id, sum(c_e9) AS s
                       FROM contrib GROUP BY query_id, id)
            SELECT query_id, rank, doc_id, score_e9 FROM (
                SELECT query_id, id AS doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY s DESC, id ASC) AS rank,
                       s::BIGINT AS score_e9
                FROM scores)
            WHERE rank <= 10
        """

    # fused re-ranking as a reusable block: the hybrid_rrf entry verbatim,
    # also wrapped by rank_rbo (agreement audits the ranking it measures)
    hybrid_sql = f"""
            WITH bm AS ({bm25_sql}),
            {classifier_feats_sql()},
            margins AS (
                SELECT doc_id,
                       COALESCE(list_aggregate(
                           list_transform(fs,
                               t -> ({classifier_weight_expr('t', 'duckdb')})),
                           'sum'), 0)::BIGINT AS margin
                FROM feats
            ),
            cand AS (
                SELECT bm.query_id, bm.doc_id,
                       bm.rank::INT AS bm25_rank, m.margin
                FROM bm JOIN margins m USING (doc_id)
            ),
            ranked AS (
                SELECT query_id, doc_id, bm25_rank,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY margin DESC, doc_id ASC)::INT AS q_rank
                FROM cand
            ),
            fused AS (
                SELECT query_id, doc_id, bm25_rank, q_rank,
                       (1000000000000 // (60 + bm25_rank)
                        + 1000000000000 // (60 + q_rank))::BIGINT AS rrf_e12
                FROM ranked
            )
            SELECT query_id, doc_id, bm25_rank, q_rank, rrf_e12,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rrf_e12 DESC, doc_id ASC)::INT AS fused_rank
            FROM fused
        """

    # RM3-lite PRF twin (retrieval.bm25_prf): same statistics head and
    # folded constants as bm25_sql; per-term contributions computed once
    # (cb), base ranking selects 5 feedback docs, their top-3 non-query
    # terms expand the vocabulary at weight 1 vs 2 for originals
    bm25_prf_sql = f"""
            WITH toks AS (
                SELECT doc_id AS id, t.term
                FROM documents,
                     UNNEST(regexp_split_to_array(lower(text), '\\s+')) AS t(term)
                WHERE t.term <> ''
            ),
            tf AS (SELECT id, term, count(*) AS tf FROM toks GROUP BY id, term),
            dl AS (SELECT id, sum(tf)::BIGINT AS dl FROM tf GROUP BY id),
            corpus AS (SELECT count(*) AS n_docs, sum(dl)::BIGINT AS sum_dl
                       FROM dl),
            dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            qterms AS (SELECT * FROM {queries_values_sql()}),
            cb AS (
                SELECT tf.id, tf.term,
                       floor(
                           floor(ln((c.n_docs - dft.df + 0.5)
                                    / (dft.df + 0.5) + 1.0) * 1e12)::DOUBLE
                           * ((tf.tf * 2.25)
                              / (tf.tf + 1.25 * (0.25 + 0.75 *
                                  (dl.dl / (c.sum_dl::DOUBLE / c.n_docs)))))
                           / 1e3
                       )::DECIMAL(20,0) AS c_e9
                FROM tf
                JOIN dft USING (term)
                JOIN dl ON dl.id = tf.id
                CROSS JOIN corpus c
            ),
            base AS (
                SELECT q.query_id, cb.id, sum(cb.c_e9) AS s
                FROM cb JOIN qterms q USING (term)
                GROUP BY q.query_id, cb.id
            ),
            fb AS (
                SELECT query_id, id FROM (
                    SELECT query_id, id,
                           row_number() OVER (PARTITION BY query_id
                                              ORDER BY s DESC, id ASC) AS r
                    FROM base) WHERE r <= 5
            ),
            fbagg AS (
                SELECT f.query_id, t.term, sum(t.tf) AS sum_tf
                FROM tf t JOIN fb f ON f.id = t.id
                GROUP BY f.query_id, t.term
            ),
            fbx AS (
                SELECT * FROM fbagg a
                WHERE NOT EXISTS (SELECT 1 FROM qterms q
                                  WHERE q.query_id = a.query_id
                                    AND q.term = a.term)
            ),
            expt AS (
                SELECT query_id, term FROM (
                    SELECT query_id, term,
                           row_number() OVER (
                               PARTITION BY query_id
                               ORDER BY sum_tf DESC, term ASC) AS r
                    FROM fbx) WHERE r <= 3
            ),
            wq AS (
                SELECT query_id, term, 2 AS w FROM qterms
                UNION ALL
                SELECT query_id, term, 1 AS w FROM expt
            ),
            sc AS (
                SELECT wq.query_id, cb.id,
                       sum(cb.c_e9 * wq.w::DECIMAL(2,0)) AS s
                FROM cb JOIN wq USING (term)
                GROUP BY wq.query_id, cb.id
            )
            SELECT query_id, rank, doc_id, score_w_e9 FROM (
                SELECT query_id, id AS doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY s DESC, id ASC) AS rank,
                       s::BIGINT AS score_w_e9
                FROM sc)
            WHERE rank <= 10
        """

    disc_sql, cum_sql = discount_values_sql(10)
    return {
        "bm25_prf": bm25_prf_sql,
        "expectations_report": _expectations_oracle_sql(),
        "flesch_reading": _flesch_oracle_sql(),
        "retrieval_eval": f"""
            WITH bm AS ({bm25_sql}),
            dtt AS (
                SELECT DISTINCT doc_id AS id, t.term
                FROM documents,
                     UNNEST(regexp_split_to_array(lower(text), '\\s+'))
                         AS t(term)
                WHERE t.term <> ''
            ),
            qt AS (SELECT * FROM {queries_values_sql()}),
            nt AS (SELECT query_id, count(*) AS n_terms
                   FROM qt GROUP BY query_id),
            rel AS (
                SELECT q.query_id, d.id
                FROM dtt d JOIN qt q USING (term)
                JOIN nt ON nt.query_id = q.query_id
                GROUP BY q.query_id, d.id, nt.n_terms
                HAVING count(*) = nt.n_terms
            ),
            nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel
                     FROM rel GROUP BY query_id),
            lab AS (
                SELECT bm.query_id, bm.rank, disc.d_e12,
                       (r.id IS NOT NULL) AS is_rel
                FROM bm
                JOIN {disc_sql} ON disc.rnk = bm.rank
                LEFT JOIN rel r ON r.query_id = bm.query_id
                               AND r.id = bm.doc_id
            ),
            perq AS (
                SELECT query_id,
                       sum(CASE WHEN is_rel THEN d_e12 ELSE 0 END)::BIGINT
                           AS dcg_e12,
                       COALESCE(min(CASE WHEN is_rel THEN rank END), 0)
                           AS first_rank
                FROM lab GROUP BY query_id
            )
            SELECT nt.query_id,
                   COALESCE(nrel.n_rel, 0)::BIGINT AS n_rel,
                   COALESCE(perq.first_rank, 0)::INT AS first_rank,
                   (CASE WHEN COALESCE(perq.first_rank, 0) > 0
                         THEN 1000000 // perq.first_rank
                         ELSE 0 END)::BIGINT AS mrr_e6,
                   COALESCE(perq.dcg_e12, 0)::BIGINT AS dcg_e12,
                   idc.i_e12::BIGINT AS idcg_e12,
                   (CASE WHEN idc.i_e12 > 0
                         THEN COALESCE(perq.dcg_e12, 0) * 1000000
                              // idc.i_e12
                         ELSE 0 END)::BIGINT AS ndcg_e6
            FROM nt
            LEFT JOIN nrel USING (query_id)
            LEFT JOIN perq USING (query_id)
            JOIN {cum_sql}
              ON idc.m = least(COALESCE(nrel.n_rel, 0), 10)
        """,
        "merge_upsert": """
            WITH ks AS (
                SELECT (max(doc_id) + 1) * 2 AS ks FROM documents
            ), ch AS (
                SELECT event_id % ks AS doc_id,
                       event_id AS version,
                       CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END
                           AS op,
                       event_type || ' ' || props AS text
                FROM events CROSS JOIN ks
            ), u AS (
                SELECT doc_id, -1::BIGINT AS version, 'U' AS op, text
                FROM documents
                UNION ALL
                SELECT doc_id, version, op, text FROM ch
            ), m AS (
                SELECT doc_id,
                       max(version) AS final_version,
                       count(*) AS n_ops,
                       arg_max(op, version) AS op,
                       arg_max(text, version) AS text
                FROM u GROUP BY doc_id
            )
            SELECT doc_id, final_version, n_ops, text
            FROM m WHERE op = 'U'
        """,
        "snapshot_diff": """
            WITH ks AS (
                SELECT (max(doc_id) + 1) * 2 AS ks FROM documents
            ), ch AS (
                SELECT event_id % ks AS doc_id,
                       event_id AS version,
                       CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END
                           AS op,
                       event_type || ' ' || props AS text
                FROM events CROSS JOIN ks
            ), u AS (
                SELECT doc_id, -1::BIGINT AS version, 'U' AS op, text
                FROM documents
                UNION ALL
                SELECT doc_id, version, op, text FROM ch
            ), m AS (
                SELECT doc_id,
                       arg_max(op, version) AS op,
                       arg_max(text, version) AS text
                FROM u GROUP BY doc_id
            ), aft AS (
                SELECT doc_id, text FROM m WHERE op = 'U'
            ), d AS (
                SELECT COALESCE(b.doc_id, a.doc_id) AS doc_id,
                       CASE WHEN b.doc_id IS NULL THEN 'I'
                            WHEN a.doc_id IS NULL THEN 'D'
                            WHEN b.text IS DISTINCT FROM a.text THEN 'U'
                       END AS op,
                       b.text AS text_before, a.text AS text_after
                FROM documents b FULL OUTER JOIN aft a
                  ON a.doc_id = b.doc_id
            )
            SELECT doc_id, op, text_before, text_after
            FROM d WHERE op IS NOT NULL
        """,
        "time_travel_read": """
            WITH ks AS (
                SELECT (max(doc_id) + 1) * 2 AS ks FROM documents
            ), ch AS (
                SELECT event_id % ks AS doc_id,
                       event_id AS version,
                       CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END
                           AS op,
                       event_type || ' ' || props AS text
                FROM events CROSS JOIN ks
            ), cut AS (
                SELECT (min(version) + max(version)) // 2 AS as_of FROM ch
            ), u AS (
                SELECT doc_id, -1::BIGINT AS version, 'U' AS op, text
                FROM documents
                UNION ALL
                SELECT doc_id, version, op, text
                FROM ch CROSS JOIN cut WHERE version <= as_of
            ), m AS (
                SELECT doc_id,
                       max(version) AS final_version,
                       count(*) AS n_ops,
                       arg_max(op, version) AS op,
                       arg_max(text, version) AS text
                FROM u GROUP BY doc_id
            )
            SELECT doc_id, final_version, n_ops, text,
                   (SELECT as_of FROM cut) AS as_of
            FROM m WHERE op = 'U'
        """,
        "file_prune_stats": _prune_oracle_sql(),
        "late_data_stats": _late_oracle_sql(),
        "concurrency_stats": _concurrency_oracle_sql(),
        "srm_check": _srm_oracle_sql(),
        "anomaly_mad": _anomaly_oracle_sql(),
        "corpus_boilerplate": _bp_oracle_sql(),
        "boilerplate_strip": _bp_strip_oracle_sql(),
        "c4_filters": _c4_oracle_sql(),
        "encoding_report": _encoding_oracle_sql(),
        "secrets_detect": _secrets_oracle_sql(),
        "lexical_diversity": _lexdiv_oracle_sql(),
        "k_anonymity": _kanon_oracle_sql(),
        "rater_kappa": _kappa_oracle_sql(),
        "context_budget": _ctx_oracle_sql(),
        "sq_error": _sq_oracle_sql(),
        "gini_concentration": _gini_oracle_sql(),
        "mann_kendall": _mk_oracle_sql(),
        "heaps_law": _heaps_oracle_sql(),
        "interarrival_stats": _ia_oracle_sql(),
        "cusum_changepoint": _cusum_oracle_sql(),
        "script_mix": _script_oracle_sql(),
        "source_temperature": _stemp_oracle_sql(),
        "l_diversity": _ldiv_oracle_sql(),
        "t_closeness": _tclose_oracle_sql(),
        "char_entropy": _chent_oracle_sql(),
        "negative_sampling": _ns_oracle_sql(),
        "fertility_by_lang": _fert_oracle_sql(),
        "ks_drift": _ks_oracle_sql(),
        "ess_by_source": _ess_oracle_sql(),
        "benford_audit": _benford_oracle_sql(),
        "zipf_fit": _zipf_oracle_sql(),
        "ppjoin_pairs": _ppjoin_oracle_sql(),
        "theil_sen": _theil_oracle_sql(),
        "vocab_overlap": _vocab_oracle_sql(),
        "hill_tail": _hill_oracle_sql(),
        "freq_spectrum": _fspec_oracle_sql(),
        "transition_entropy": _te_oracle_sql(),
        "length_fences": _fences_oracle_sql(),
        "meta_mi": _meta_mi_oracle_sql(),
        "kcenter_coreset": _kcenter_oracle_sql(),
        "props_keys": _props_oracle_sql(),
        "pareto_users": _pareto_oracle_sql(),
        "type_affinity": _taff_oracle_sql(),
        "weekday_profile": _wd_oracle_sql(),
        "conversion_lag": _clag_oracle_sql(),
        "postings_compression": _postings_oracle_sql(),
        "apportion_sample": _apportion_oracle_sql(),
        "assortativity": f"""
            WITH {jaccard_pair_ctes()},
            {_assort_oracle_tail()}
        """,
        "vocab_delta": _vdelta_oracle_sql(),
        "survival_curve": _surv_oracle_sql(),
        "trimmed_mean": _tmean_oracle_sql(),
        "source_jsd": _sjsd_oracle_sql(),
        "dedup_savings": f"""
            WITH RECURSIVE {jaccard_pair_ctes()},
            {_closure("pairs")},
            dstot AS (SELECT sum(n_chars)::BIGINT AS corpus_bytes
                      FROM documents),
            dsex AS (
                SELECT count(*)::BIGINT AS n,
                       sum(n_chars)::BIGINT AS b,
                       min(n_chars)::BIGINT AS keep_b
                FROM documents GROUP BY md5(text)
                HAVING count(*) >= 2
            ),
            dse AS (
                SELECT 'exact' AS tier, count(*)::BIGINT AS n_groups,
                       coalesce(sum(n), 0)::BIGINT AS n_docs_grouped,
                       coalesce(sum(b - keep_b), 0)::BIGINT
                           AS bytes_saved
                FROM dsex
            ),
            dscl AS (
                SELECT node, canonical_id, d.n_chars::BIGINT AS nb
                FROM lab JOIN documents d ON d.doc_id = lab.node
            ),
            dsc AS (
                SELECT 'cluster' AS tier,
                       count(DISTINCT canonical_id)::BIGINT AS n_groups,
                       count(*)::BIGINT AS n_docs_grouped,
                       sum(CASE WHEN node != canonical_id THEN nb
                                ELSE 0 END)::BIGINT AS bytes_saved
                FROM dscl
            ),
            dsu AS (SELECT * FROM dse UNION ALL SELECT * FROM dsc)
            SELECT tier, n_groups, n_docs_grouped, bytes_saved,
                   (bytes_saved::HUGEINT * 1000000
                    // corpus_bytes)::BIGINT AS save_ratio_e6
            FROM dsu CROSS JOIN dstot
        """,
        "spearman_lq": f"""
            WITH {classifier_feats_sql()}, sqs AS (
                SELECT f.doc_id,
                       COALESCE(list_aggregate(
                           list_transform(fs,
                               t -> ({classifier_weight_expr('t',
                                                             'duckdb')})),
                           'sum'), 0)::BIGINT AS margin
                FROM feats f
            ), sqj AS (
                SELECT d.doc_id, d.n_chars::BIGINT AS x, s.margin
                FROM documents d JOIN sqs s USING (doc_id)
                WHERE d.n_chars IS NOT NULL
            ), sqr AS (
                SELECT row_number() OVER (ORDER BY x, doc_id) AS rx,
                       row_number() OVER (ORDER BY margin, doc_id) AS rm
                FROM sqj
            ), sqa AS (
                SELECT count(*)::BIGINT AS n,
                       sum((rx - rm)::HUGEINT * (rx - rm)) AS sum_d2
                FROM sqr
            )
            SELECT n AS n_docs, sum_d2::BIGINT AS sum_d2,
                   ((n::HUGEINT * (n::HUGEINT * n - 1) - 6 * sum_d2)
                    * 1000000
                    // (n::HUGEINT * (n::HUGEINT * n - 1)))::BIGINT
                       AS rho_e6
            FROM sqa WHERE n > 1
        """,
        "conformal_threshold": f"""
            WITH {classifier_feats_sql()}, cfs AS (
                SELECT f.doc_id,
                       COALESCE(list_aggregate(
                           list_transform(fs,
                               t -> ({classifier_weight_expr('t',
                                                             'duckdb')})),
                           'sum'), 0)::BIGINT AS margin
                FROM feats f
            ), cfp AS (
                SELECT s.doc_id, margin FROM cfs s
                JOIN documents USING (doc_id) WHERE lang = 'en'
            ), cfc AS (
                SELECT margin,
                       row_number() OVER (ORDER BY margin) AS rn,
                       count(*) OVER ()::BIGINT AS n_cal
                FROM cfp WHERE doc_id % 2 = 0
            ), cft AS (
                SELECT margin AS tau_margin, n_cal FROM cfc
                WHERE rn = (n_cal + 1) // 10
            )
            SELECT n_cal, count(*)::BIGINT AS n_test, tau_margin,
                   sum(CASE WHEN p.margin >= tau_margin THEN 1 ELSE 0
                       END)::BIGINT AS n_covered,
                   (sum(CASE WHEN p.margin >= tau_margin THEN 1 ELSE 0
                        END)::HUGEINT * 1000000 // count(*))::BIGINT
                       AS coverage_e6
            FROM cfp p CROSS JOIN cft
            WHERE p.doc_id % 2 = 1
            GROUP BY n_cal, tau_margin
        """,
        "cluster_label_mi": f"""
            WITH {kmeans_ctes()},
            clw AS (
                SELECT id, c_id FROM dF
                QUALIFY row_number() OVER (PARTITION BY id
                                           ORDER BY dist2, c_id) = 1
            ),
            clc AS (
                SELECT e.label::VARCHAR AS xk, w.c_id::VARCHAR AS yk,
                       count(*)::BIGINT AS c_xy
                FROM clw w JOIN embeddings e ON e.vec_id = w.id
                GROUP BY xk, yk
            ),
            clx AS (SELECT xk, sum(c_xy)::BIGINT AS c_x FROM clc
                    GROUP BY xk),
            cly AS (SELECT yk, sum(c_xy)::BIGINT AS c_y FROM clc
                    GROUP BY yk),
            cln AS (SELECT sum(c_xy)::BIGINT AS nn FROM clc),
            clp AS (
                SELECT xk, yk, c_xy,
                       floor((ln(c_xy::DOUBLE / c_x::DOUBLE)
                              - ln(c_y::DOUBLE / nn::DOUBLE))
                             * 1e9)::BIGINT AS pmi_e9, nn
                FROM clc JOIN clx USING (xk) JOIN cly USING (yk)
                CROSS JOIN cln
            ),
            clt AS (
                SELECT (sum(c_xy::HUGEINT * pmi_e9) // max(nn))::BIGINT
                           AS mi_e9
                FROM clp
            )
            SELECT xk AS source, yk AS lang, c_xy, pmi_e9, mi_e9
            FROM clp CROSS JOIN clt
        """,
        "bottomk_estimate": f"""
            WITH {jaccard_pair_ctes()},
            {_bk_oracle_tail()}
        """,
        "manifest_stats": f"""
            WITH msb AS (
                SELECT {md5_int60("doc_id::VARCHAR || ':0'")} % 16
                           AS bucket,
                       count(*)::BIGINT AS n_rows
                FROM documents GROUP BY bucket
            ),
            mst AS (SELECT sum(n_rows)::BIGINT AS tot,
                           max(n_rows) AS mx,
                           count(*)::BIGINT AS k FROM msb)
            SELECT bucket, n_rows,
                   (n_rows::HUGEINT * 1000000 // tot)::BIGINT AS share_e6,
                   (mx::HUGEINT * k * 1000000 // tot)::BIGINT AS skew_e6
            FROM msb CROSS JOIN mst
        """,
        "ivf_balance": f"""
            WITH {kmeans_ctes()},
            ibw AS (
                SELECT id, c_id FROM dF
                QUALIFY row_number() OVER (PARTITION BY id
                                           ORDER BY dist2, c_id) = 1
            ),
            ibp AS (SELECT c_id AS cluster_id, count(*)::BIGINT AS n_vecs
                    FROM ibw GROUP BY c_id),
            ibt AS (SELECT sum(n_vecs)::BIGINT AS nn,
                           count(*)::BIGINT AS k FROM ibp)
            SELECT cluster_id, n_vecs,
                   (n_vecs::HUGEINT * 1000000 // nn)::BIGINT AS share_e6,
                   (n_vecs::HUGEINT * k * 1000000 // nn)::BIGINT
                       AS imb_e6
            FROM ibp CROSS JOIN ibt
        """,
        "shard_balance": f"""
            WITH sbp AS (
                SELECT {md5_int60('doc_id::VARCHAR')} % 32 AS shard,
                       count(*)::BIGINT AS n_docs,
                       sum(n_chars)::BIGINT AS n_bytes
                FROM documents WHERE n_chars IS NOT NULL
                GROUP BY shard
            ),
            sbt AS (SELECT max(n_bytes) AS mx, sum(n_bytes)::BIGINT
                               AS tot,
                           count(*)::BIGINT AS k FROM sbp)
            SELECT shard, n_docs, n_bytes,
                   (mx::HUGEINT * k * 1000000 // tot)::BIGINT AS skew_e6
            FROM sbp CROSS JOIN sbt
        """,
        "blocking_quality": f"""
            WITH {jaccard_pair_ctes()},
            {minhash_cand_ctes(params_values_sql(64),
                               include_shingles=False)},
            bqd AS (SELECT count(DISTINCT id)::BIGINT AS n_docs FROM sh),
            bqt AS (SELECT count(*)::BIGINT AS n_true FROM pairs),
            bqc AS (SELECT count(*)::BIGINT AS n_cand FROM cand),
            bqf AS (SELECT count(*)::BIGINT AS n_found
                    FROM cand JOIN pairs USING (id_a, id_b))
            SELECT n_docs, n_true, n_cand, n_found,
                   ((n_docs::HUGEINT * (n_docs - 1) // 2 - n_cand)
                    * 1000000
                    // (n_docs::HUGEINT * (n_docs - 1) // 2))::BIGINT
                       AS rr_e6,
                   (n_found::HUGEINT * 1000000 // n_true)::BIGINT
                       AS pc_e6
            FROM bqd CROSS JOIN bqt CROSS JOIN bqc CROSS JOIN bqf
            WHERE n_true > 0
        """,
        "reshard_stats": f"""
            WITH rsp AS (
                SELECT CASE WHEN {md5_int60('doc_id::VARCHAR')} % 16
                            != {md5_int60('doc_id::VARCHAR')} % 17
                            THEN 1 ELSE 0 END AS mv_mod,
                       CASE WHEN {md5_int60("doc_id::VARCHAR || ':16'")}
                            > greatest({', '.join(
                                md5_int60(f"doc_id::VARCHAR || ':{s}'")
                                for s in range(16))})
                            THEN 1 ELSE 0 END AS mv_hrw
                FROM documents
            ),
            rsa AS (
                SELECT count(*)::BIGINT AS n_docs,
                       sum(mv_mod)::BIGINT AS moved_mod,
                       sum(mv_hrw)::BIGINT AS moved_hrw
                FROM rsp
            )
            SELECT n_docs, moved_mod, moved_hrw,
                   (moved_mod::HUGEINT * 1000000 // n_docs)::BIGINT
                       AS frac_mod_e6,
                   (moved_hrw::HUGEINT * 1000000 // n_docs)::BIGINT
                       AS frac_hrw_e6
            FROM rsa
        """,
        "cross_source_dups": f"""
            WITH {jaccard_pair_ctes()},
            csl AS (
                SELECT least(da.source, db.source) AS src_lo,
                       greatest(da.source, db.source) AS src_hi
                FROM pairs
                JOIN documents da ON da.doc_id = pairs.id_a
                JOIN documents db ON db.doc_id = pairs.id_b
            ),
            csm AS (
                SELECT src_lo, src_hi, count(*)::BIGINT AS n_pairs
                FROM csl GROUP BY src_lo, src_hi
            ),
            cst AS (SELECT sum(n_pairs)::BIGINT AS tot FROM csm)
            SELECT src_lo, src_hi, n_pairs,
                   (n_pairs::HUGEINT * 1000000 // tot)::BIGINT
                       AS share_e6
            FROM csm CROSS JOIN cst
        """,
        "containment_pairs": containment_pair_sql(),
        "scd2_history": """
            WITH ks AS (
                SELECT (max(doc_id) + 1) * 2 AS ks FROM documents
            ), ch AS (
                SELECT event_id % ks AS doc_id,
                       event_id AS version,
                       CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END
                           AS op,
                       event_type || ' ' || props AS text
                FROM events CROSS JOIN ks
            ), u AS (
                SELECT doc_id, -1::BIGINT AS version, 'U' AS op, text
                FROM documents
                UNION ALL
                SELECT doc_id, version, op, text FROM ch
            ), h AS (
                SELECT doc_id, version AS valid_from,
                       lead(version) OVER (PARTITION BY doc_id
                                           ORDER BY version) AS valid_to,
                       op, text
                FROM u
            )
            SELECT doc_id, valid_from, valid_to, text,
                   CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
            FROM h WHERE op = 'U'
        """,
        "incremental_view_update": """
            WITH ks AS (
                SELECT (max(doc_id) + 1) * 2 AS ks FROM documents
            ), ch AS (
                SELECT event_id % ks AS doc_id,
                       event_id AS version,
                       CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END
                           AS op,
                       event_type || ' ' || props AS text
                FROM events CROSS JOIN ks
            ), u AS (
                SELECT doc_id, -1::BIGINT AS version, 'U' AS op, text
                FROM documents
                UNION ALL
                SELECT doc_id, version, op, text FROM ch
            ), m AS (
                SELECT doc_id,
                       arg_max(op, version) AS op,
                       arg_max(text, version) AS text
                FROM u GROUP BY doc_id
            )
            SELECT doc_id % 16 AS g, count(*) AS n_docs,
                   sum(COALESCE(length(text), 0))::BIGINT AS n_chars
            FROM m WHERE op = 'U'
            GROUP BY 1
        """,
        "zorder_layout": f"""
            WITH {zorder_oracle_ctes()}
            SELECT bucket_id, n_rows, min_q1, max_q1, min_q2, max_q2,
                   pruned FROM zb
        """,
        "analyze_table_stats": analyze_oracle_sql(),
        "quality_classifier": f"""
            WITH {classifier_feats_sql()}
            SELECT doc_id, len(fs)::BIGINT AS n_feats,
                   COALESCE(list_aggregate(
                       list_transform(fs,
                           t -> ({classifier_weight_expr('t', 'duckdb')})),
                       'sum'), 0)::BIGINT AS margin,
                   CASE WHEN COALESCE(list_aggregate(
                            list_transform(fs,
                                t -> ({classifier_weight_expr('t', 'duckdb')})),
                            'sum'), 0) > 0
                        THEN 'keep' ELSE 'drop' END AS label
            FROM feats
        """,
        "position_deletes": """
            WITH data AS (
                SELECT event_id % 64 AS pos,
                       floor(event_id / 64)::BIGINT AS file_id,
                       floor(value * 1000)::BIGINT AS value_e3,
                       event_type
                FROM events
            ), del AS (
                SELECT DISTINCT file_id, pos, 1 AS _del
                FROM data WHERE event_type = 'error'
            )
            SELECT file_id,
                   count(*)::BIGINT AS n_rows,
                   sum(CASE WHEN _del IS NOT NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS n_deleted,
                   sum(CASE WHEN _del IS NULL THEN 1 ELSE 0 END)
                       ::BIGINT AS n_live,
                   sum(CASE WHEN _del IS NULL THEN value_e3
                            ELSE 0 END)::BIGINT AS live_value_sum
            FROM data LEFT JOIN del USING (file_id, pos)
            GROUP BY file_id
        """,
        "calibration_bins": f"""
            WITH {classifier_feats_sql()}, s AS (
                SELECT f.doc_id,
                       COALESCE(list_aggregate(
                           list_transform(fs,
                               t -> ({classifier_weight_expr('t', 'duckdb')})),
                           'sum'), 0)::BIGINT AS margin
                FROM feats f
            ), j AS (
                SELECT margin,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                FROM s JOIN documents USING (doc_id)
            ), g AS (
                SELECT floor(margin / 1000.0)::BIGINT AS bucket,
                       count(*)::BIGINT AS n,
                       sum(y)::BIGINT AS n_pos,
                       sum(margin)::BIGINT AS sum_margin
                FROM j GROUP BY 1
            )
            SELECT bucket, n, n_pos, sum_margin,
                   floor(n_pos::DOUBLE / n::DOUBLE * 1e9)::BIGINT
                       AS pos_rate_e9
            FROM g
        """,
        "classifier_auc": f"""
            WITH {classifier_feats_sql()}, s AS (
                SELECT f.doc_id,
                       COALESCE(list_aggregate(
                           list_transform(fs,
                               t -> ({classifier_weight_expr('t', 'duckdb')})),
                           'sum'), 0)::BIGINT AS margin
                FROM feats f
            ), lab AS (
                SELECT doc_id,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                FROM documents
            ), g AS (
                SELECT margin, sum(y)::BIGINT AS pos,
                       sum(1 - y)::BIGINT AS neg
                FROM s JOIN lab USING (doc_id) GROUP BY margin
            ), p AS (
                SELECT pos, neg,
                       COALESCE(sum(neg) OVER (
                           ORDER BY margin
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0)::BIGINT
                           AS neg_below
                FROM g
            ), tot AS (
                SELECT sum(pos)::BIGINT AS n_pos,
                       sum(neg)::BIGINT AS n_neg,
                       sum(2 * pos * neg_below + pos * neg)::BIGINT AS u2
                FROM p
            )
            SELECT n_pos, n_neg, u2,
                   floor(u2::DOUBLE / (2 * n_pos * n_neg)::DOUBLE
                         * 1e9)::BIGINT AS auc_e9
            FROM tot
        """,
        "dsir_weights": f"""
            WITH {classifier_feats_sql()}, {dsir_lambda_sql()}
            SELECT i.doc_id, i.is_target,
                   sum(CASE WHEN i.b IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                       AS n_feats,
                   COALESCE(sum(l.lam_e9), 0)::BIGINT AS logw_e9
            FROM inst i LEFT JOIN lam l USING (b)
            GROUP BY i.doc_id, i.is_target
        """,
        "cooccurrence_pairs": f"""
            WITH {cooccurrence_pair_ctes()}
            SELECT id_a, id_b, n_common FROM pairs
        """,
        "link_prediction": f"""
            WITH {cooccurrence_pair_ctes()},
            {link_prediction_sql(min_common=2)}
        """,
        "kcore_peel": f"""
            WITH {jaccard_pair_ctes()},
            {kcore_ctes(2, 3)}
            SELECT d.src AS node_id, d.deg AS core_deg
            FROM kd3 d JOIN ka3 a ON a.src = d.src
        """,
        "lpa_communities": f"""
            WITH {jaccard_pair_ctes()},
            {lpa_ctes(3)}
            SELECT node AS node_id, lab AS community FROM ll3
        """,
        "neighborhood_sizes": f"""
            WITH {jaccard_pair_ctes()},
            {ball_ctes(2)}
            SELECT src AS node_id, count(*)::BIGINT AS ball_size
            FROM nb2 GROUP BY src
        """,
        "walk_centrality": f"""
            WITH {jaccard_pair_ctes()},
            {walk_ctes(3)}
            SELECT id, s::BIGINT AS walks FROM wx3
        """,
        "source_modularity": f"""
            WITH {jaccard_pair_ctes()},
            {_modularity_oracle_sql()}
        """,
        "split_leakage": f"""
            WITH {jaccard_pair_ctes()},
            spl AS (
                SELECT doc_id,
                       CASE WHEN {md5_int60('doc_id::VARCHAR')} % 100 < 5
                                THEN 'test'
                            WHEN {md5_int60('doc_id::VARCHAR')} % 100 < 10
                                THEN 'val'
                            ELSE 'train' END AS sp
                FROM documents
            )
            SELECT least(a.sp, b.sp) AS split_a,
                   greatest(a.sp, b.sp) AS split_b,
                   count(*)::BIGINT AS n_pairs
            FROM pairs p
            JOIN spl a ON a.doc_id = p.id_a
            JOIN spl b ON b.doc_id = p.id_b
            GROUP BY 1, 2
        """,
        "fuzzy_decontaminate": f"""
            WITH {minhash_cand_ctes(params_values_sql(64))},
            fcand AS (
                SELECT DISTINCT a.id AS id, b.id AS bid
                FROM banded a JOIN banded b USING (band, bucket)
                WHERE b.id % 13 = 0 AND a.id <> b.id
            ),
            fm AS (
                SELECT c.id, c.bid,
                       sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)::BIGINT
                           AS n_match
                FROM fcand c
                JOIN mh ma ON ma.id = c.id
                JOIN mh mb ON mb.id = c.bid AND mb.i = ma.i
                GROUP BY c.id, c.bid
            )
            SELECT id AS doc_id, bid AS bench_id, n_match
            FROM fm WHERE n_match >= 32
        """,
        "pagerank_dedup": f"""
            WITH {jaccard_pair_ctes()},
            {pagerank_ctes(3)}
            SELECT p.node AS doc_id,
                   COALESCE(d.deg, 0)::BIGINT AS deg,
                   p.rank AS rank_e12
            FROM pr3 p LEFT JOIN degt d ON d.src = p.node
        """,
        "triangle_stats": f"""
            WITH {jaccard_pair_ctes()},
            e AS (SELECT id_a AS a, id_b AS b FROM pairs),
            sym3 AS (
                SELECT a AS src, b AS dst FROM e
                UNION ALL SELECT b, a FROM e
            ),
            degt3 AS (SELECT src, count(*) AS deg FROM sym3 GROUP BY src),
            kk AS (
                SELECT src AS v, deg * 4294967296 + src AS k FROM degt3
            ),
            ek AS (
                SELECT e.a, e.b, ka.k AS ka, kb.k AS kb
                FROM e JOIN kk ka ON ka.v = e.a JOIN kk kb ON kb.v = e.b
            ),
            oe AS (
                SELECT CASE WHEN ka < kb THEN a ELSE b END AS s,
                       CASE WHEN ka < kb THEN b ELSE a END AS d,
                       CASE WHEN ka < kb THEN kb ELSE ka END AS kd
                FROM ek
            ),
            wed AS (
                SELECT w1.d AS d1, w2.d AS d2
                FROM oe w1 JOIN oe w2 ON w1.s = w2.s AND w1.kd < w2.kd
            ),
            tri AS (
                SELECT count(*) AS n_triangles
                FROM wed JOIN oe ON oe.s = wed.d1 AND oe.d = wed.d2
            ),
            ne AS (SELECT count(*) AS n_edges FROM e),
            nw AS (SELECT sum(deg * (deg - 1) // 2)::BIGINT AS n_wedges
                   FROM degt3)
            SELECT n_edges, n_wedges, n_triangles,
                   CASE WHEN n_wedges > 0
                        THEN floor(3 * n_triangles::DOUBLE
                                   / n_wedges::DOUBLE * 1e6)::BIGINT
                        ELSE 0 END AS global_cc_e6
            FROM ne CROSS JOIN nw CROSS JOIN tri
        """,
        "retention_cohorts": """
            WITH act AS (
                SELECT DISTINCT user_id AS u,
                       epoch_us(ts) // 604800000000 AS w
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            ), first AS (
                SELECT u, min(w) AS cw FROM act GROUP BY u
            )
            SELECT cw AS cohort_week, w - cw AS week_offset,
                   count(*) AS n_active
            FROM act JOIN first USING (u)
            GROUP BY 1, 2
        """,
        "psi_drift": """
            WITH t AS (
                SELECT epoch_us(ts) AS u, event_type
                FROM events
                WHERE ts IS NOT NULL AND event_type IS NOT NULL
            ), mm AS (
                SELECT min(u) AS lo, max(u) AS hi FROM t
            ), h AS (
                SELECT event_type, u <= (lo + hi) // 2 AS is_ref
                FROM t CROSS JOIN mm
            ), c AS (
                SELECT event_type,
                       sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT
                           AS c_ref,
                       sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT
                           AS c_live
                FROM h GROUP BY event_type
            ), tt AS (
                SELECT sum(c_ref)::BIGINT AS n_ref,
                       sum(c_live)::BIGINT AS n_live,
                       count(*) AS v
                FROM c
            )
            SELECT event_type, c_ref, c_live,
                   floor(((c_ref + 1)::DOUBLE / (n_ref + v)
                          - (c_live + 1)::DOUBLE / (n_live + v))
                         * ln(((c_ref + 1)::DOUBLE * (n_live + v))
                              / ((c_live + 1)::DOUBLE * (n_ref + v)))
                         * 1e9)::BIGINT AS psi_e9
            FROM c CROSS JOIN tt
        """,
        "hll_sliding_distinct": f"""
            WITH df AS (
                SELECT epoch_us(ts) // 86400000000 AS day, user_id
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            ), hh AS (
                SELECT day,
                       ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                           AS h
                FROM df
            ), r AS (
                SELECT day, h & 63 AS j,
                       CASE WHEN (h >> 6) > 0
                            THEN 55 - length(bin(h >> 6))
                            ELSE 55 END AS rho
                FROM hh
            ), daily AS (
                SELECT day, j, max(rho) AS mj FROM r GROUP BY day, j
            ), days AS (
                SELECT DISTINCT day FROM daily
            ), expanded AS (
                SELECT daily.day + k AS t_day, j, mj
                FROM daily, UNNEST(range(0, 7)) AS t(k)
            ), merged AS (
                SELECT t_day, j, max(mj) AS mj
                FROM expanded JOIN days ON days.day = expanded.t_day
                GROUP BY t_day, j
            ), g AS (
                SELECT t_day,
                       sum(1::BIGINT << (55 - mj))::BIGINT AS s_present,
                       count(*) AS n_buckets
                FROM merged GROUP BY t_day
            ), e AS (
                SELECT t_day,
                       {hll_num} / CAST(s_present
                           + (64 - n_buckets) * (1::BIGINT << 55)
                           AS DOUBLE) AS raw,
                       CAST(64 - n_buckets AS DOUBLE) AS v
                FROM g
            ), e2 AS (
                SELECT t_day,
                       CASE WHEN raw <= 160.0 AND v > 0
                            THEN 64.0 * ln(64.0 / v)
                            ELSE raw END AS est
                FROM e
            ), exq AS (
                SELECT df.day + k AS t_day, user_id
                FROM df, UNNEST(range(0, 7)) AS t(k)
            ), ex AS (
                SELECT t_day, count(DISTINCT user_id) AS n_exact
                FROM exq JOIN days ON days.day = exq.t_day
                GROUP BY t_day
            )
            SELECT ex.t_day AS day, ex.n_exact,
                   floor(e2.est * 1e4)::BIGINT AS est_hll_e4
            FROM ex JOIN e2 USING (t_day)
        """,
        "ab_conversion_chi2": """
            WITH pu AS (
                SELECT user_id,
                       max(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) AS conv
                FROM events WHERE user_id IS NOT NULL
                GROUP BY user_id
            ), c AS (
                SELECT sum(CASE WHEN user_id % 2 = 0 AND conv = 1
                                THEN 1 ELSE 0 END)::BIGINT AS conv_a,
                       sum(CASE WHEN user_id % 2 = 0 AND conv = 0
                                THEN 1 ELSE 0 END)::BIGINT AS nonconv_a,
                       sum(CASE WHEN user_id % 2 = 1 AND conv = 1
                                THEN 1 ELSE 0 END)::BIGINT AS conv_b,
                       sum(CASE WHEN user_id % 2 = 1 AND conv = 0
                                THEN 1 ELSE 0 END)::BIGINT AS nonconv_b
                FROM pu
            )
            , h AS (
                -- HUGEINT (int128) arithmetic: same ~1e38 headroom as the
                -- Spark side's DECIMAL(38,0), exact to ~1e7 users/cell
                SELECT conv_a, nonconv_a, conv_b, nonconv_b,
                       conv_a::HUGEINT AS ha, nonconv_a::HUGEINT AS hb,
                       conv_b::HUGEINT AS hc, nonconv_b::HUGEINT AS hd
                FROM c
            )
            SELECT conv_a, nonconv_a, conv_b, nonconv_b,
                   CASE WHEN (ha + hb) * (hc + hd) * (ha + hc)
                             * (hb + hd) > 0
                        THEN floor(
                            ((ha + hb + hc + hd)
                             * (ha * hd - hb * hc)
                             * (ha * hd - hb * hc))::DOUBLE
                            / ((ha + hb) * (hc + hd) * (ha + hc)
                               * (hb + hd))::DOUBLE
                            * 1e6)::BIGINT
                        ELSE 0 END AS chi2_e6
            FROM h
        """,
        "event_trigrams": """
            WITH s AS (
                SELECT event_type AS e1,
                       lead(event_type, 1) OVER w AS e2,
                       lead(event_type, 2) OVER w AS e3
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), c AS (
                SELECT e1, e2, e3, count(*) AS cnt
                FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
                GROUP BY e1, e2, e3
            )
            SELECT e1, e2, e3, cnt,
                   row_number() OVER (ORDER BY cnt DESC, e1, e2, e3)::INT
                       AS rnk
            FROM c
            QUALIFY rnk <= 20
        """,
        "cuped_adjusted": """
            WITH t AS (
                SELECT user_id, epoch_us(ts) AS u,
                       floor(value * 100)::BIGINT AS cents
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
                      AND value IS NOT NULL
            ), mm AS (
                SELECT min(u) AS lo, max(u) AS hi FROM t
            ), pu AS (
                SELECT user_id,
                       sum(CASE WHEN u <= (lo + hi) // 2
                                THEN cents ELSE 0 END)::BIGINT AS x,
                       sum(CASE WHEN u > (lo + hi) // 2
                                THEN cents ELSE 0 END)::BIGINT AS y
                FROM t CROSS JOIN mm GROUP BY user_id
            ), pooled AS (
                SELECT count(*) AS n, sum(x)::BIGINT AS sx,
                       sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
                       sum(x * x)::BIGINT AS sxx
                FROM pu
            ), v AS (
                SELECT user_id % 2 AS variant, count(*) AS n_v,
                       sum(x)::BIGINT AS sx_v, sum(y)::BIGINT AS sy_v
                FROM pu GROUP BY 1
            )
            SELECT variant, n_v AS n_users, sx_v AS sum_x_cents,
                   sy_v AS sum_y_cents,
                   floor((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                         / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                         * 1e6)::BIGINT AS theta_e6,
                   floor(sy_v::DOUBLE / n_v::DOUBLE * 1e6)::BIGINT
                       AS mean_y_e6,
                   floor((sy_v::DOUBLE / n_v::DOUBLE
                          - (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                            / (n::DOUBLE * sxx::DOUBLE
                               - sx::DOUBLE * sx::DOUBLE)
                            * (sx_v::DOUBLE / n_v::DOUBLE
                               - sx::DOUBLE / n::DOUBLE))
                         * 1e6)::BIGINT AS mean_adj_e6
            FROM v CROSS JOIN pooled
        """,
        "embedding_outliers": """
            WITH qe AS (
                SELECT vec_id AS id, label::BIGINT AS lbl, i AS pos,
                       floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS x
                FROM embeddings,
                     UNNEST(range(1, len(embedding) + 1)) AS t(i)
                WHERE label IS NOT NULL
            ), cent AS (
                SELECT lbl, pos, (sum(x) // count(*))::BIGINT AS m
                FROM qe GROUP BY lbl, pos
            ), d AS (
                SELECT q.id, q.lbl,
                       sum((q.x - c.m) * (q.x - c.m))::BIGINT AS dist2
                FROM qe q JOIN cent c ON c.lbl = q.lbl AND c.pos = q.pos
                GROUP BY q.id, q.lbl
            )
            SELECT id AS vec_id, lbl AS label, dist2,
                   row_number() OVER (PARTITION BY lbl
                                      ORDER BY dist2 DESC, id)::INT AS rnk
            FROM d
            QUALIFY rnk <= 5
        """,
        "hard_negatives": """
            WITH qe AS (
                SELECT vec_id AS id, label::BIGINT AS lbl, i AS pos,
                       floor(embedding[i]::DOUBLE * 1000000)::BIGINT AS x
                FROM embeddings,
                     UNNEST(range(1, len(embedding) + 1)) AS t(i)
                WHERE label IS NOT NULL
            ), qs AS (
                SELECT id AS q_id, lbl AS q_lbl
                FROM (SELECT DISTINCT id, lbl FROM qe)
                ORDER BY q_id LIMIT 8
            ), qp AS (
                SELECT qs.q_id, qs.q_lbl, qe.pos, qe.x AS qx
                FROM qs JOIN qe ON qe.id = qs.q_id
            ), d AS (
                SELECT qp.q_id, c.id,
                       sum((c.x - qp.qx) * (c.x - qp.qx))::BIGINT AS dist2
                FROM qe c
                JOIN qp ON qp.pos = c.pos AND c.lbl <> qp.q_lbl
                GROUP BY qp.q_id, c.id
            )
            SELECT q_id, id AS neg_id, dist2
            FROM d
            QUALIFY row_number() OVER (PARTITION BY q_id
                                       ORDER BY dist2, id) = 1
        """,
        "bm25_topk": bm25_sql,
        "turn_revisions": """
            WITH e AS (
                SELECT user_id, props,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
                WHERE user_id IS NOT NULL AND ts IS NOT NULL
            ), tk AS (
                -- token sets via UNNEST + self-join: a deliberately
                -- different physical strategy from Spark's
                -- array_intersect/array_union codegen
                SELECT user_id, rn,
                       unnest(list_distinct(list_filter(
                           regexp_split_to_array(lower(
                               COALESCE(props, '')), '[^a-z0-9]+'),
                           x -> x <> ''))) AS tok
                FROM e
            ), sz AS (
                SELECT user_id, rn, count(*)::BIGINT AS n
                FROM tk GROUP BY 1, 2
            ), prs AS (
                SELECT user_id, rn FROM e WHERE rn >= 2
            ), inter AS (
                SELECT a.user_id, a.rn, count(*)::BIGINT AS i
                FROM tk a
                JOIN tk b ON b.user_id = a.user_id AND b.rn = a.rn - 1
                         AND b.tok = a.tok
                GROUP BY 1, 2
            ), j AS (
                SELECT p.user_id,
                       COALESCE(i.i, 0) AS i,
                       COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
                           - COALESCE(i.i, 0) AS u
                FROM prs p
                LEFT JOIN inter i ON i.user_id = p.user_id AND i.rn = p.rn
                LEFT JOIN sz sa ON sa.user_id = p.user_id AND sa.rn = p.rn
                LEFT JOIN sz sb ON sb.user_id = p.user_id
                               AND sb.rn = p.rn - 1
            )
            SELECT 'conv' || user_id::VARCHAR AS conv_id,
                   count(*) AS n_pairs,
                   sum(CASE WHEN u > 0
                            AND (i * 1000000) // u >= 500000
                            THEN 1 ELSE 0 END)::BIGINT AS n_revisions,
                   sum(CASE WHEN u > 0 THEN (i * 1000000) // u
                            ELSE 0 END)::BIGINT AS sum_jaccard_e6
            FROM j GROUP BY 1
        """,
        "bpe_merges": bpe_oracle_sql(),
        "bpe_encode": bpe_encode_oracle_sql(),
        "pq_codes": _pq_oracle_sql(),
        "ivfpq_topk": _ivfpq_oracle_sql(),
        "pmi_pairs": _pmi_oracle_sql(),
        "quantile_effects": _qte_oracle_sql(),
        "vacuum_candidates": """
            WITH t AS (
                SELECT event_id AS file_id, event_type AS part,
                       user_id AS slot, event_id AS version,
                       epoch_us(ts) AS ts_us
                FROM events WHERE ts IS NOT NULL
            ), mm AS (
                SELECT min(ts_us) AS lo, max(ts_us) AS hi FROM t
            ), lv AS (
                SELECT file_id, part, slot, version, ts_us,
                       max(version) OVER (PARTITION BY part, slot)
                           AS live_version
                FROM t
            )
            SELECT file_id, part, slot, version, live_version, ts_us
            FROM lv CROSS JOIN mm
            WHERE version < live_version AND ts_us <= (lo + hi) // 2
        """,
        "semdedup": f"""
            WITH {kmeans_ctes()},
            wF AS (
                SELECT id, c_id FROM dF
                QUALIFY row_number() OVER (PARTITION BY id
                                           ORDER BY dist2, c_id) = 1
            ),
            norms AS (
                SELECT id, sum(x * x)::BIGINT AS n2 FROM qe GROUP BY id
            ),
            prs AS (
                SELECT a.id AS id_a, b.id AS id_b,
                       sum(qa.x * qb.x)::BIGINT AS dot
                FROM wF a
                JOIN wF b ON a.c_id = b.c_id AND a.id < b.id
                JOIN qe qa ON qa.id = a.id
                JOIN qe qb ON qb.id = b.id AND qb.pos = qa.pos
                GROUP BY a.id, b.id
            ),
            dups AS (
                -- 0.95^2 = 361/400 exact; HUGEINT = the Spark side's
                -- DECIMAL(38,0) headroom
                SELECT DISTINCT p.id_b AS id
                FROM prs p
                JOIN norms na ON na.id = p.id_a
                JOIN norms nb ON nb.id = p.id_b
                WHERE p.dot > 0
                  AND 400 * (p.dot::HUGEINT * p.dot::HUGEINT)
                      >= 361 * (na.n2::HUGEINT * nb.n2::HUGEINT)
            )
            SELECT w.id AS vec_id, w.c_id::BIGINT AS cluster_id,
                   CASE WHEN d.id IS NULL THEN 1 ELSE 0 END::INT AS keep
            FROM wF w LEFT JOIN dups d USING (id)
        """,
        "skew_report": """
            WITH counts AS (
                SELECT user_id AS key, count(*) AS cnt
                FROM events WHERE user_id IS NOT NULL
                GROUP BY user_id
            ), totals AS (
                SELECT count(*) AS n_keys, sum(cnt)::BIGINT AS n_rows
                FROM counts
            ), ranked AS (
                SELECT row_number() OVER (ORDER BY cnt DESC, key ASC)::INT
                           AS rank,
                       key, cnt
                FROM counts
            )
            SELECT rank, key, cnt,
                   (cnt * 1000000 // n_rows)::BIGINT AS share_e6,
                   (cnt * n_keys // n_rows)::BIGINT AS salt_factor
            FROM ranked CROSS JOIN totals
            WHERE rank <= 10
        """,
        "hybrid_rrf": hybrid_sql,
        # rank_rbo wraps the SAME fused ranking (hybrid_sql verbatim) so
        # the agreement readout cannot drift from the ranking it audits;
        # suffix weights come from retrieval.rbo_suffix_sql (exact
        # integers, total div 25200 = rbo_e9 — see retrieval.py)
        "rank_rbo": f"""
            WITH fused_out AS ({hybrid_sql})
            SELECT query_id,
                   count(*)::BIGINT AS n_docs,
                   sum(abs(bm25_rank - fused_rank))::BIGINT AS footrule,
                   (sum(sw.sw) // 25200)::BIGINT AS rbo_e9
            FROM fused_out
            JOIN {rbo_suffix_sql()}
              ON sw.m = greatest(bm25_rank, fused_rank)
            GROUP BY query_id
        """,
        "compact_files": f"""
            WITH mf AS (
                SELECT lang AS part, doc_id AS file_id,
                       (n_chars + 512)::BIGINT AS size_bytes
                FROM documents
                WHERE doc_id IS NOT NULL AND lang IS NOT NULL
                  AND n_chars IS NOT NULL
            ), {compact_oracle_ctes(8192)}
            SELECT part, file_id, size_bytes, out_bucket FROM assigned
        """,
        # IVM proof: the oracle RECOMPUTES the view from the merged table
        # (the strategy the incremental path exists to avoid)
        "split_by_cluster": f"""
            WITH RECURSIVE {jaccard_cluster_ctes}
            SELECT d.doc_id,
                   coalesce(lab.canonical_id, d.doc_id) AS split_key,
                   ({md5_int60("coalesce(lab.canonical_id, d.doc_id)::VARCHAR")}
                    % 100)::INT AS bucket,
                   CASE WHEN ({md5_int60(
                       "coalesce(lab.canonical_id, d.doc_id)::VARCHAR")}
                        % 100) < 5 THEN 'test'
                        WHEN ({md5_int60(
                       "coalesce(lab.canonical_id, d.doc_id)::VARCHAR")}
                        % 100) < 10 THEN 'val'
                        ELSE 'train' END AS split
            FROM documents d LEFT JOIN lab ON lab.node = d.doc_id
        """,
        # composition of the quality, cluster, and split oracles — must
        # mirror ops/curate.py predicate-for-predicate
        "multimodal_frames": """
            WITH m AS (
                SELECT doc_id::BIGINT AS media_id,
                       lower(hex(encode(text))) AS full_hex,
                       octet_length(encode(text)) AS n,
                       (octet_length(encode(text)) % 7 + 1) AS f
                FROM documents
            )
            SELECT media_id, i::INT AS frame_idx, (n // f)::INT AS frame_bytes,
                   substr(full_hex, (i * (n // f) * 2 + 1)::INT,
                          least((n // f) * 2, 16)::INT) AS frame_head_hex
            FROM m, UNNEST(range(0, f)) AS t(i)
            WHERE n // f > 0
        """,
        "multimodal_features": """
            SELECT doc_id::BIGINT AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   lower(hex(encode(text)))[1:16] AS head_hex,
                   (octet_length(encode(text)) % 640 + 16)::INT AS width,
                   (octet_length(encode(text)) % 480 + 16)::INT AS height
            FROM documents
        """,
        # stub resize: payload truncated to out_w*out_h/256 = 16 bytes
        "multimodal_resize": """
            SELECT doc_id::BIGINT AS media_id,
                   least(octet_length(encode(text)), 16) AS n_bytes,
                   lower(hex(encode(text)))[1:16] AS head_hex,
                   64 AS width, 64 AS height
            FROM documents
        """,
        # stub frame sampling: n_frames = len%7+1 equal chunks of len//n
        "approx_distinct_hll": f"""
            WITH h AS (
                -- NULL users carry no identity (count_distinct ignores
                -- them; the Spark side filters them the same way)
                SELECT event_type,
                       ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                           AS h
                FROM events WHERE user_id IS NOT NULL
            ), r AS (
                SELECT event_type, h & 63 AS j,
                       CASE WHEN (h >> 6) > 0
                            THEN 55 - length(bin(h >> 6))
                            ELSE 55 END AS rho
                FROM h
            ), regs AS (
                SELECT event_type, j, max(rho) AS mj
                FROM r GROUP BY event_type, j
            ), g AS (
                SELECT event_type,
                       sum(1::BIGINT << (55 - mj))::BIGINT AS s_present,
                       count(*) AS n_buckets
                FROM regs GROUP BY event_type
            ), e AS (
                SELECT event_type,
                       {hll_num} / CAST(s_present
                           + (64 - n_buckets) * (1::BIGINT << 55)
                           AS DOUBLE) AS raw,
                       CAST(64 - n_buckets AS DOUBLE) AS v
                FROM g
            ), e2 AS (
                SELECT event_type,
                       CASE WHEN raw <= 160.0 AND v > 0
                            THEN 64.0 * ln(64.0 / v)
                            ELSE raw END AS est
                FROM e
            )
            -- floor(x*1e4) -> BIGINT, not round(): round() diverges
            -- across engines (see bigram_surprisal)
            SELECT x.event_type, x.n_exact,
                   floor(e2.est * 1e4)::BIGINT AS est_hll_e4,
                   floor((e2.est - x.n_exact) / x.n_exact * 1e4)::BIGINT
                       AS rel_err_e4
            FROM (SELECT event_type, count(DISTINCT user_id) AS n_exact
                  FROM events GROUP BY event_type) x
            JOIN e2 USING (event_type)
        """,
        "ann_ivf_topk": """
            WITH v AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ),
            cents AS (
                SELECT vec_id AS c_id, e AS c_vec FROM v
                ORDER BY vec_id LIMIT 8
            ),
            v_assign AS (
                SELECT vec_id, e, c_id FROM (
                    SELECT v.vec_id, v.e, c.c_id,
                           row_number() OVER (
                               PARTITION BY v.vec_id
                               ORDER BY list_cosine_similarity(v.e, c.c_vec)
                                            DESC, c.c_id ASC) AS c_rank
                    FROM v, cents c)
                WHERE c_rank <= 1
            ),
            q_assign AS (
                SELECT vec_id AS q_id, e AS qe, c_id FROM (
                    SELECT v.vec_id, v.e, c.c_id,
                           row_number() OVER (
                               PARTITION BY v.vec_id
                               ORDER BY list_cosine_similarity(v.e, c.c_vec)
                                            DESC, c.c_id ASC) AS c_rank
                    FROM v, cents c
                    WHERE v.vec_id < 8)
                WHERE c_rank <= 2
            ),
            cand AS (
                SELECT DISTINCT q.q_id, q.qe, a.vec_id, a.e
                FROM v_assign a JOIN q_assign q USING (c_id)
            )
            SELECT q_id, vec_id, round(c, 6) AS cosine, rank FROM (
                SELECT q_id, vec_id,
                       list_cosine_similarity(e, qe) AS c,
                       row_number() OVER (PARTITION BY q_id
                                          ORDER BY list_cosine_similarity(e, qe)
                                                       DESC, vec_id ASC) AS rank
                FROM cand)
            WHERE rank <= 5
        """,
        # random-hyperplane LSH with the exact same numpy-seeded coefficients
        # embedded as a VALUES table (ops/ann.py planes_values_sql)
        "gopher_quality": r"""
            WITH w AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS ws
                FROM documents
            ), m AS (
                -- mean = SUM of word lengths / n_words (multi-char
                -- whitespace runs are not word characters); zero-word
                -- docs carry NULL means and False flags on both engines
                SELECT doc_id, len(ws) AS n_words,
                       CASE WHEN len(ws) > 0 THEN
                           list_sum(list_transform(ws, x -> length(x)))
                               ::DOUBLE / len(ws) END AS mwl,
                       len(list_filter(ws,
                           x -> regexp_matches(x, '^[a-z]+$'))) AS alpha,
                       len(list_intersect(list_distinct(ws),
                           ['the','be','to','of','and','that','have',
                            'with','a'])) AS stop_hits
                FROM w
            )
            SELECT doc_id, n_words::INT AS n_words,
                   floor(mwl * 1e4)::BIGINT AS mean_word_len_e4,
                   floor(CASE WHEN n_words > 0
                              THEN alpha::DOUBLE / n_words END
                         * 1e4)::BIGINT AS alpha_ratio_e4,
                   stop_hits::INT AS stop_hits,
                   (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
                   CASE WHEN n_words > 0
                        THEN (mwl >= 3.0 AND mwl <= 10.0)
                        ELSE FALSE END AS ok_word_len,
                   stop_hits >= 2 AS ok_stopwords,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND (CASE WHEN n_words > 0
                              THEN (mwl >= 3.0 AND mwl <= 10.0)
                              ELSE FALSE END)
                    AND stop_hits >= 2) AS keep
            FROM m
        """,
        # idf floors to BIGINT at 1e12 BEFORE the tf multiply, so the
        # score is a pure integer product (see textstats.tfidf_keywords)
        "cross_surprisal": r"""
            WITH w AS (
                SELECT doc_id AS id, doc_id % 2 = 0 AS is_corpus,
                       regexp_split_to_array(lower(text), '\s+') AS a
                FROM documents
            ), b AS (
                SELECT id, is_corpus, a[i] AS w1, a[i + 1] AS w2
                FROM w, UNNEST(range(1, len(a))) AS t(i)
                WHERE a[i] <> '' AND a[i + 1] <> ''
            ), c12 AS (
                SELECT w1, w2, count(*) AS c12
                FROM b WHERE is_corpus GROUP BY w1, w2
            ), c1 AS (
                SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1
            ), vocab AS (
                SELECT count(DISTINCT w)::BIGINT AS v FROM (
                    SELECT w1 AS w FROM b WHERE is_corpus
                    UNION ALL
                    SELECT w2 AS w FROM b WHERE is_corpus)
            ), s AS (
                -- Laplace: unseen transitions get -ln(1/(c1+V)), a join
                -- miss on c1 degrades to -ln(1/V)
                SELECT nb.id,
                       floor(-ln(CAST(COALESCE(c12.c12, 0) + 1 AS DOUBLE)
                                 / (COALESCE(c1.c1, 0) + vocab.v))
                             * 1e12)::DECIMAL(20,0) AS s
                FROM b nb
                LEFT JOIN c12 USING (w1, w2)
                LEFT JOIN c1 USING (w1)
                CROSS JOIN vocab
                WHERE NOT nb.is_corpus
            )
            SELECT id AS doc_id, count(*) AS n_bigrams,
                   (sum(s)::HUGEINT
                    // (count(*)::HUGEINT * 1000000))::BIGINT
                       AS mean_surprisal_e6
            FROM s GROUP BY id
        """,
        "lang_id": """
            WITH s AS (
                SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents
            ),
            sc AS (
                SELECT doc_id,
                  ((length(p)-length(replace(p,' the ','')))/5.0
                 + (length(p)-length(replace(p,' and ','')))/5.0
                 + (length(p)-length(replace(p,' of ','')))/4.0
                 + (length(p)-length(replace(p,' to ','')))/4.0
                 + (length(p)-length(replace(p,' is ','')))/4.0) AS score_en,
                  ((length(p)-length(replace(p,' der ','')))/5.0
                 + (length(p)-length(replace(p,' die ','')))/5.0
                 + (length(p)-length(replace(p,' und ','')))/5.0
                 + (length(p)-length(replace(p,' ist ','')))/5.0
                 + (length(p)-length(replace(p,' das ','')))/5.0) AS score_de,
                  ((length(p)-length(replace(p,' le ','')))/4.0
                 + (length(p)-length(replace(p,' la ','')))/4.0
                 + (length(p)-length(replace(p,' et ','')))/4.0
                 + (length(p)-length(replace(p,' est ','')))/5.0
                 + (length(p)-length(replace(p,' les ','')))/5.0) AS score_fr,
                  ((length(p)-length(replace(p,' el ','')))/4.0
                 + (length(p)-length(replace(p,' la ','')))/4.0
                 + (length(p)-length(replace(p,' que ','')))/5.0
                 + (length(p)-length(replace(p,' de ','')))/4.0
                 + (length(p)-length(replace(p,' es ','')))/4.0) AS score_es
                FROM s
            )
            SELECT doc_id, score_en, score_de, score_fr, score_es,
                   CASE WHEN greatest(score_en, score_de, score_fr, score_es) <= 0
                        THEN 'und'
                        WHEN score_en >= score_de AND score_en >= score_fr
                             AND score_en >= score_es THEN 'en'
                        WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
                        WHEN score_fr >= score_es THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM sc
        """,
        "adaptive_quality": """
            WITH q AS (
                SELECT doc_id, lang,
                       round(
                         (CASE WHEN length(text) < 20 THEN 0.0 ELSE 1.0 END)
                         * (CASE WHEN (length(text)
                                  - (length(regexp_split_to_array(text, '\\s+')) - 1))
                                  / length(regexp_split_to_array(text, '\\s+'))::DOUBLE > 12
                                 THEN 0.5 ELSE 1.0 END)
                         * (1.0 - (length(text)
                                   - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                                  / (length(text) + 1)), 4) AS quality_score
                FROM documents
            ),
            r AS (
                SELECT lang, doc_id, quality_score,
                       row_number() OVER (PARTITION BY lang
                           ORDER BY quality_score ASC NULLS LAST, doc_id)
                           AS rn,
                       count(*) OVER (PARTITION BY lang) AS n
                FROM q
            ),
            thr AS (
                SELECT lang,
                       max(CASE WHEN rn = floor((n - 1) * 0.25) + 1
                                THEN quality_score END) AS q_thr
                FROM r GROUP BY lang
            )
            SELECT q.doc_id, q.lang,
                   floor(quality_score * 1e4)::BIGINT AS score_e4,
                   floor(q_thr * 1e4)::BIGINT AS thr_e4,
                   (quality_score >= q_thr) AS kept
            FROM q JOIN thr USING (lang)
        """,
        # batch-vs-corpus screen: odd ids flagged iff any band bucket
        # collides with an even id's bucket — mirrors ops/dedup.py
        # incremental_dedup over the same banded CTE as the LSH pairs
        "cms_heavy_hitters": rf"""
            WITH t AS (
                SELECT unnest(regexp_split_to_array(lower(text), '\s+'))
                    AS word
                FROM documents
            ), w AS (
                SELECT word FROM t WHERE word <> ''
            ), x AS (
                SELECT word,
                       ('0x' || substr(md5(word), 1, 15))::BIGINT
                           % 2147483647 AS x
                FROM w
            ), h AS (
                SELECT x.word, params.i,
                       ((params.a * x.x + params.b) % 2147483647) % {CMS_W}
                           AS bucket
                FROM x, {cms_params}
            ), cms AS (
                SELECT i, bucket, count(*) AS c FROM h GROUP BY i, bucket
            ), top AS (
                SELECT word, count(*) AS n_exact
                FROM w GROUP BY word
                ORDER BY n_exact DESC, word LIMIT 20
            ), th AS (
                SELECT top.word, top.n_exact, h.i, h.bucket
                FROM top JOIN h USING (word)
                GROUP BY top.word, top.n_exact, h.i, h.bucket
            )
            SELECT th.word, th.n_exact,
                   min(cms.c)::BIGINT AS est_cms,
                   (min(cms.c) - th.n_exact)::BIGINT AS overestimate
            FROM th JOIN cms USING (i, bucket)
            GROUP BY th.word, th.n_exact
        """,
        "bigram_surprisal": r"""
            WITH w AS (
                SELECT doc_id AS id,
                       regexp_split_to_array(lower(text), '\s+') AS a
                FROM documents
            ), b AS (
                SELECT id, a[i] AS w1, a[i + 1] AS w2
                FROM w, UNNEST(range(1, len(a))) AS t(i)
                WHERE a[i] <> '' AND a[i + 1] <> ''
            ), c12 AS (
                SELECT w1, w2, count(*) AS c12 FROM b GROUP BY w1, w2
            ), c1 AS (
                SELECT w1, sum(c12)::BIGINT AS c1 FROM c12 GROUP BY w1
            ), st AS (
                -- floor(x*1e12): bit-identical across engines, unlike
                -- round() (implementations differ; see textstats)
                SELECT w1, w2,
                       floor(-ln(CAST(c12.c12 AS DOUBLE) / c1.c1)
                             * 1e12)::DECIMAL(20,0) AS s
                FROM c12 JOIN c1 USING (w1)
            ), s AS (
                SELECT b.id, st.s FROM b JOIN st USING (w1, w2)
            )
            -- integer-exact mean at 1e-6 (HUGEINT floor division) — no
            -- double round-trip, mirrors the Spark div
            SELECT id AS doc_id, count(*) AS n_bigrams,
                   (sum(s)::HUGEINT
                    // (count(*)::HUGEINT * 1000000))::BIGINT
                       AS mean_surprisal_e6
            FROM s GROUP BY id
        """,
        # cross_surprisal: odd doc_ids scored under the even-id corpus's
        # add-one-smoothed bigram LM (ops/textstats.py cross_surprisal) —
        # same floor-e12 / HUGEINT-mean discipline as bigram_surprisal
        "curate_corpus": f"""
            WITH RECURSIVE {jaccard_cluster_ctes},
            dupes AS (
                SELECT node AS doc_id FROM lab WHERE node <> canonical_id
            ),
            qual AS (
                SELECT doc_id,
                       length(regexp_split_to_array(text, '\\s+'))::INT
                           AS n_words,
                       round(
                         (CASE WHEN length(text) < 20 THEN 0.0 ELSE 1.0 END)
                         * (CASE WHEN (length(text)
                                  - (length(regexp_split_to_array(text, '\\s+')) - 1))
                                  / length(regexp_split_to_array(text, '\\s+'))::DOUBLE > 12
                                 THEN 0.5 ELSE 1.0 END)
                         * (1.0 - (length(text)
                                  - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                                  / (length(text) + 1)), 4) AS quality_score
                FROM documents
            ),
            spl AS (
                SELECT doc_id,
                       CASE
                           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 5
                               THEN 'test'
                           WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100 < 10
                               THEN 'val'
                           ELSE 'train'
                       END AS split
                FROM documents
            )
            SELECT q.doc_id, q.n_words, q.quality_score, s.split
            FROM qual q JOIN spl s USING (doc_id)
            WHERE q.quality_score >= 0.5 AND q.n_words >= 25
              AND q.doc_id NOT IN (SELECT doc_id FROM dupes)
        """,
        # simhash fingerprints (same md5-vote construction as "simhash"),
        # all-pairs hamming <= 3 (exact superset of the pigeonhole blocking,
        # which loses no pairs at this distance), recursive closure as in
        # dedup_cluster_canonical
    }
