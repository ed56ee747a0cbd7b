"""reffy_ray — a Ray-Data-native spec-crawl and data-processing engine.

From-scratch reimplementation of the capabilities of w3c/reffy
(reference read-only at /root/reference) as Ray Data pipelines over
Arrow span tables. See SURVEY.md for the blueprint.
"""

__version__ = "0.2.0"  # 0.2.0: documents schema gained last_modified
