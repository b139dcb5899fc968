# Stage modules are imported directly (splunk_otel_collector_ray.stages.parse
# etc.); no eager re-exports so partial installs / lazy imports stay cheap.
