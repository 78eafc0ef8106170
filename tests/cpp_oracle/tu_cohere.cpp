// Compiles the unmodified reference plugin source (by absolute path — never
// copied into this repo) against the JUCE stub, to serve as a null-test oracle.
#define JucePlugin_Name "Juicy Cohere"
#define createPluginFilter createPluginFilter_cohere
#include "/root/reference/src/plugins/JuicyCohere/PluginProcessor.cpp"
