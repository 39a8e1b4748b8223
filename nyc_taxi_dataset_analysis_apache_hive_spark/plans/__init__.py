from .explain import explain_str, has_pushed_filters, join_strategies, wholestage_codegen_spans

__all__ = [
    "explain_str",
    "has_pushed_filters",
    "join_strategies",
    "wholestage_codegen_spans",
]
