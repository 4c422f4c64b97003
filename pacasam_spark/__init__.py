"""pacasam_spark — a from-scratch, PySpark-native patch-catalogue sampling
and spatial-join engine with the query/data-processing capabilities of
IGNF/pacasam (reference at /root/reference, studied for semantics only).

Architecture (idiomatic Spark, NOT a port):

- ``sources``   : deterministic synthetic catalogue generators + file scans
                  (reference: connectors/{synthetic,geopandas,lipac}.py)
- ``operators`` : composable DataFrame -> DataFrame transforms — filters,
                  exact-n deterministic sampling, normalization, FPS,
                  priority union-dedup, as-of join, dedup/similarity/text
                  training-data ops
- ``samplers``  : the seven pacasam samplers re-expressed as lazy DataFrame
                  pipelines (reference: samplers/*.py)
- ``spatial``   : hierarchical cell index (H3/S2-like generalization of the
                  reference's slab id), point-in-box joins, zone filters
- ``extract``   : image/patch extraction as Arrow UDF pipelines with a
                  resume manifest (reference: extractors/*.py)
- ``plans``     : lineage + metrics tables (north-rule checkpointing)
- ``streaming`` : Structured Streaming demos over the events table

Determinism policy (SURVEY.md §4.3-2): every random choice is a pure
function of a portable integer hash of the row key and a seed — never of
row order or partitioning — so results are bitwise reproducible across
cluster sizes and are expressible in ANSI SQL for DuckDB oracles.
"""

__version__ = "0.1.0"
