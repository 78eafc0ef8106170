// Compiles the unmodified reference plugin source (by absolute path — never
// copied into this repo) against the JUCE stub, to serve as a null-test oracle.
#define JucePlugin_Name "Juicy Motion"
#define createPluginFilter createPluginFilter_motion
#include "/root/reference/src/plugins/JuicyMotion/PluginProcessor.cpp"
