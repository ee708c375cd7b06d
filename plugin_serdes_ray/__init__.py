"""plugin_serdes_ray — a Ray-Data-native columnar re-encode / serde engine.

A from-scratch re-expression of kestra-io/plugin-serdes' capabilities
(format conversions, schema inference, type coercion) as idiomatic Ray Data
pipelines, centered on a per-column lightweight-compression engine
(dictionary, RLE, FSST, bit-packing, frame-of-reference) with sample-based
codec auto-selection, a chunked container format, and bit-identical decode.

Layout:
    codecs/     pure per-Arrow-array encoders/decoders + registry
    container.py chunked column container file format (write/read)
    plan.py     two-pass codec auto-selection (stats -> EncodePlan)
    encode.py   Ray Data encode/decode pipelines (resumable, partitioned)
    sources/    X -> Dataset readers   (CSV/JSON/YAML/XML/Avro/TOON/...)
    sinks/      Dataset -> X writers
    functions/  scalar-layer semantics (coercion, inference, text transforms)
    pipelines/  large-scale training-data ops (dedup, ANN, text stats)
    state/      checkpoint / lineage manifests
"""

__version__ = "0.1.0"
