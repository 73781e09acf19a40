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
"""
