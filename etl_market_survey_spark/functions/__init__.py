"""Scalar/aggregate function library (JVM-side expressions only).

Submodules:
- stats      — multi-statistic aggregation kernel (mean/std/median/MAD),
               exact decimal summation for cross-engine determinism, ECDF.
- histogram  — 1D/2D histogram binning incl. numpy-'auto' bin policy.
- strings    — measurement-name grammar (voltage token, device token,
               timestamp prefix), type classifier.
- text       — language ID, quality scoring, token counting, fingerprints.

(Embedding math — cosine/dot on array<float> — lives with its consumers
in operators/similarity.)
"""
