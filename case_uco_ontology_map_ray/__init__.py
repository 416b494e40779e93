"""Ray-Data-native CASE/UCO knowledge-graph construction engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference repo ``kismatkunwar89/CASE-UCO-ontology-map`` (see SURVEY.md),
expressed as Ray Data pipelines: ``ray.data.Dataset`` -> ``map_batches``
over zero-copy Arrow batches, actor pools for stateful stages, explicit
groupby/shuffle steps for entity linking and canonicalization.

Layout
------
- ``config``     : namespaces, JSON-LD context, alias maps, frozen ontology maps
- ``functions/`` : pure scalar/vectorized kernels (naming, fingerprint, jsonld,
                   text analysis, hashing/sketches)
- ``kg/``        : deterministic KG core — record extraction, UUID planning,
                   property mapping, graph composition, triple flattening
- ``ontology/``  : TTL-derived ontology index (SHACL-lite shapes) + validation
- ``sources/``   : transcript reader + deterministic synthetic generator
- ``stages/``    : Ray Data stages (actor-pool map_batches classes)
- ``pipelines/`` : end-to-end pipelines (transcripts -> triples, analytics,
                   dedup, similarity)
- ``state/``     : per-partition lineage manifests + resume logic
"""

__version__ = "0.1.0"
