// Compiles the unmodified reference analyzer (by absolute path) for the oracle.
#include "/root/reference/src/shared/JuicinessAnalyzer.cpp"
