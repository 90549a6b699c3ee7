"""emma_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of emmalanguage/emma (reference at
/root/reference, read-only), re-expressed Spark-first.

Core abstraction: :class:`DataBag` — the reference's unordered,
duplicate-preserving multiset (``api/DataBag.scala:26``) as a lazy
DataFrame wrapper. Catalyst replaces the reference's compile-time
optimizer (SURVEY.md §4); this package adds what Spark doesn't do:
bag-faithful semantics, fold algebras, keyed mutable state, loop
auto-caching, and large-scale training-data ops (dedup, similarity,
text analysis, multimodal plumbing).
"""

from .core import DataBag, GroupedBag, sql
from .functions import alg
from .functions.expr import Elem, eq, ne, struct
from .operators.asof import asof_join
from .operators.range import range_join
from .operators.rollup import hyper_rollup
from .operators.skew import salted_join
from .plans.cache import auto_cache
from .plans.comprehension import comprehension
from .plans.iterate import fixpoint
from .session import get_spark
from .sources import io
from .state import MutableBag

__all__ = [
    "DataBag",
    "GroupedBag",
    "MutableBag",
    "Elem",
    "alg",
    "eq",
    "ne",
    "struct",
    "auto_cache",
    "comprehension",
    "fixpoint",
    "asof_join",
    "range_join",
    "hyper_rollup",
    "salted_join",
    "get_spark",
    "io",
]

__version__ = "0.1.0"
