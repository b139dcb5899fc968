# State modules are imported directly (…state.manifest).
