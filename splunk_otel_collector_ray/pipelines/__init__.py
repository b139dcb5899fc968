# Pipeline modules are imported directly (…pipelines.logs, …pipelines.aggregate).
