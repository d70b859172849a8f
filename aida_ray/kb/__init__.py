from aida_ray.kb.kb import KB, OOKBE  # noqa: F401
