"""Camera, integrator, film, renderer."""
