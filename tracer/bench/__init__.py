from tracer.bench.harness import run_sweep, complexity_fit, SweepResult

__all__ = ["run_sweep", "complexity_fit", "SweepResult"]
