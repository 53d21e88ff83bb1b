"""Mirror-pipeline round-trip queries — filled in with the mirror
module (Delta-log reader + state machine + sink)."""
