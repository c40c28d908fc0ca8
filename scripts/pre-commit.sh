#!/usr/bin/env bash
# Manual entry point for the pre-commit gate (see .githooks/pre-commit).
exec "$(git rev-parse --show-toplevel)/.githooks/pre-commit" "$@"
