from .generate import GenerateResult, generate, greedy_sample

__all__ = ["GenerateResult", "generate", "greedy_sample"]
