from .oracle import OracleTracer, fresnel_bounce_amplitude, sample_sphere_directions

__all__ = ["OracleTracer", "fresnel_bounce_amplitude", "sample_sphere_directions"]
