"""Scale-path operators for the training-data pipeline surface.

``plans/`` holds the registered (builder, oracle) query pairs; this
package holds the reusable DataFrame→DataFrame operators those queries
compose — MinHash+LSH / SimHash dedup, winnowing fingerprints, bucketed
ANN, multimodal column plumbing. Everything here is partition-parallel
and shuffle-conscious: no ``collect()``, no O(n²) joins on the scale
path, Python only behind Arrow-batched ``mapInPandas``.
"""
