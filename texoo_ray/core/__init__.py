"""Pure-Python span/text conformance core (no Ray dependency).

Everything in this subpackage is deterministic and single-threaded; the
Ray stages in ``texoo_ray.stages`` call these functions per Arrow batch.
"""
