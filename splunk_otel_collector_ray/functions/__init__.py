# Function modules are imported directly (…functions.severity, …functions.scalars).
