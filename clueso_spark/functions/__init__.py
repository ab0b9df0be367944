"""Column-function libraries for the training-data-pipeline tier.

All helpers return JVM-side Column expressions (built-in functions +
higher-order lambdas) -- no row-at-a-time Python anywhere. The only
Python-boundary code in the package is the Arrow-batched ``mapInPandas``
multimodal featurizer in :mod:`clueso_spark.functions.multimodal`, where
byte-level decoding genuinely cannot be expressed as Column algebra.
"""

from clueso_spark.functions.text import (  # noqa: F401
    bigrams,
    doc_fingerprint,
    tokens,
    word_shingles,
)
from clueso_spark.functions.vectors import cosine_similarity, squared_norm  # noqa: F401
