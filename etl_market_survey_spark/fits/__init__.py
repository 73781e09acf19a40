"""Grouped non-linear curve fitting — the reference's UDAF surface
(SURVEY §2.9 U1-U3). Pure numpy (no scipy in the runtime): a compact
Levenberg-Marquardt in ``curve_fit``, models in ``models``, Spark
``applyInPandas`` wrappers in ``grouped``."""
