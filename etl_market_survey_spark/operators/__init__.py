"""Relational/dataflow operators (SURVEY.md §2).

Submodules:
- cuts        — data-driven predicate conjunction (F3), null-pair drop (F6).
- reshape     — pivot long->wide / melt back (R1/R2/R3).
- delta_t     — threshold-grid self-join Δt construction (J4/R4), MAD agg
                (A2), argmin (A5).
- bootstrap   — seeded per-group bootstrap resampling (A9).
- windows     — ECDF (W1), half-curve (W2), first-difference (W3).
- interpolate — inverse interpolation / threshold crossing (U4).
- dedup       — exact, MinHash-LSH, SimHash, n-gram-Jaccard, embedding
                near-dup (beyond-reference, training-data pipeline).
- similarity  — brute-force, SRP-LSH and IVF ANN over embeddings.
- multimodal  — binary-column decode/feature/resize/frame-sample plumbing
                (stubbed codecs).
- tct         — pad tagging, range normalization, distance calibration.
- waveform    — measured-data feature reconstruction from raw samples.
- asof        — as-of join + gap sessionization (composed built-ins).
- skew        — salted aggregation / replicated join for hot keys.
- salting     — hot-key-only salted equi-join (pair-identical; the
                skew lever inside phonetic/simjoin blocking).
- matmul      — distributed matrix multiply: sparse join-agg + tiled
                Arrow-GEMM (SUMMA shape).
- globalindex — global sort index without a SinglePartition exchange
                (terasort shape).
- profile     — single-pass per-column profiler + declarative
                data-quality expectations.
- merge       — SCD1 upsert, CDC snapshot diff, event-time conditional
                merge, SCD2 effective-dated history.

(Plus ~60 more: graph (pagerank/bfs/sssp/kcore/triangles/boruvka/
randomwalk/temporalbfs/hits), ANN (pq/opq/semdedup/simjoin/editdist),
sketches (kll/sketch/bloom), text (bpe/winnowing/spandedup/decontam/
tfidf/phrasesearch), eval/causal (evalmetrics/survival/linkage),
codecs (jpeg/gif/bmp/imageops/multimodal), time series (seasonal/dtw/
sax/cusum/resample) — see COVERAGE.md for the per-query map.)
"""
