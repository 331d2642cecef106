"""Pure-Python JSON-LD algorithm core (no Spark dependency).

Per-document algorithms used inside Arrow-vectorized Spark stages:
context processing, expansion, node-map generation, JSON-LD→RDF,
N-Quads IO, canonicalization.
"""

from .context import Context, JsonLdOptions, is_keyword  # noqa: F401
from .errors import JsonLdError  # noqa: F401
from .expand import expand, expand_document  # noqa: F401
