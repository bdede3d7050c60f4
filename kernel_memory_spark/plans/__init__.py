from kernel_memory_spark.plans.ast import (
    Comparison,
    Logical,
    TextSearch,
    compile_node,
    parse_infix,
)

__all__ = ["Comparison", "Logical", "TextSearch", "compile_node", "parse_infix"]
