"""Column-level transform libraries: SMTs, text analysis, vector math."""
