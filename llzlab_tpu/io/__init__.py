"""Host-side I/O: WAV files, test-vector generation (SURVEY.md layer T5)."""
