"""Source readers (receiver analogues): filelog raw-text lines."""
