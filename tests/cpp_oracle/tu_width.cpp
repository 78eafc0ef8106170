// Compiles the unmodified reference plugin source (by absolute path — never
// copied into this repo) against the JUCE stub, to serve as a null-test oracle.
#define JucePlugin_Name "Juicy Width"
#define createPluginFilter createPluginFilter_width
#include "/root/reference/src/plugins/JuicyWidth/PluginProcessor.cpp"
