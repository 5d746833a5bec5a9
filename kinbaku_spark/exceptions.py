"""Engine exceptions, API-parity with the reference's kinbaku/exception.py.

The reference raises NodeNotFound / EdgeNotFound on missing point lookups
(kinbaku/exception.py:1-31, graph.py:1032-1036, 1063-1067). KeyTooLong is
intentionally NOT reproduced: the fixed-width key limit (graph.py:1366-1367)
is a storage artifact lifted by Parquet variable-length strings (documented
deviation, SURVEY.md §7.3).
"""


class KinbakuSparkError(Exception):
    pass


class NodeNotFound(KinbakuSparkError, KeyError):
    pass


class EdgeNotFound(KinbakuSparkError, KeyError):
    pass


class BadArgument(KinbakuSparkError, TypeError):
    pass
