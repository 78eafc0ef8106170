// Compiles the unmodified reference plugin source (by absolute path — never
// copied into this repo) against the JUCE stub, to serve as a null-test oracle.
#define JucePlugin_Name "Juicy Infer"
#define createPluginFilter createPluginFilter_infer
#include "/root/reference/src/plugins/JuicyInfer/PluginProcessor.cpp"
