"""Ray Data stages: vectorized ``map_batches`` transforms and actor pools.

Every stage is either a plain function (stateless task) or a callable
class (actor pool — state built once in ``__init__``), operating on
``batch_format="pyarrow"`` batches (zero-copy from the object store).
Stages declare their requires/attaches column contract in the docstring,
mirroring the reference's annotator component contract
(MentionTagger.java:236-238).
"""
