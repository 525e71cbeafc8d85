"""Zero-change migration shim: code written against the reference
library (``from recmetrics_pyspark import novelty, personalization``,
reference recmetrics_pyspark/__init__.py) keeps working verbatim —
every public name resolves to the Spark-first implementation in
``recmetrics_pyspark_spark.compat``.
"""

from recmetrics_pyspark_spark.compat import (  # noqa: F401
    cosine_similarity_matrix,
    coverage,
    get_similarities_from_stacked,
    get_symmetrical_matrix_mean,
    get_upper_triangle_mean,
    intra_list_similarities,
    long_tail_plot,
    novelty,
    novelty_pandas,
    novelty_refac,
    personalization,
    personalization_pandas,
    vertical_vector,
)

__version__ = "0.1.0"
