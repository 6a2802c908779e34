from .relational import (
    add_literal,
    anti_join_new_rows,
    conjunctive_filter,
    multiset_equal,
    n_way_inner_join,
    rename_columns,
    union_all,
)

__all__ = [
    "add_literal",
    "anti_join_new_rows",
    "conjunctive_filter",
    "multiset_equal",
    "n_way_inner_join",
    "rename_columns",
    "union_all",
]
