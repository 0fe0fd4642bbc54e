"""Sources & sinks: PBF binary codec, apidb COPY-text, synthetic fixtures."""
