// Compiles the unmodified reference plugin source (by absolute path — never
// copied into this repo) against the JUCE stub, to serve as a null-test oracle.
#define JucePlugin_Name "Juicy Saturator"
#define createPluginFilter createPluginFilter_saturator
#include "/root/reference/src/plugins/JuicySaturator/PluginProcessor.cpp"
