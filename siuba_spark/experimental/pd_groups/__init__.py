"""``fast_mutate`` / ``fast_filter`` / ``fast_summarize`` compat aliases
(reference: siuba/experimental/pd_groups/dialect.py).

In the reference these are the fast grouped-pandas implementations a user
opts into; in siuba_spark the NATIVE verbs already lower grouped
expressions to Window / hash-aggregate plans (there is no slow
groupby-apply default to escape from), so the "fast" spellings are the
same verbs — kept so reference code ports without edits.
"""

from ...operators.core import filter as fast_filter
from ...operators.core import mutate as fast_mutate
from ...operators.grouping import summarize as fast_summarize

__all__ = ["fast_mutate", "fast_filter", "fast_summarize"]
