from .numeric import exact_avg, exact_sum, oracle_exact_avg, oracle_exact_sum

__all__ = ["exact_sum", "exact_avg", "oracle_exact_sum", "oracle_exact_avg"]
